from diseasystore_spark.plans.feature_handler import FeatureHandler
from diseasystore_spark.plans.store import Diseasystore, drop_diseasystore

__all__ = ["Diseasystore", "FeatureHandler", "drop_diseasystore"]
