from diseasystore_spark.plans.feature_handler import FeatureHandler
from diseasystore_spark.plans.lint import assert_distributed, plan_summary
from diseasystore_spark.plans.store import Diseasystore, drop_diseasystore

__all__ = [
    "Diseasystore",
    "FeatureHandler",
    "assert_distributed",
    "drop_diseasystore",
    "plan_summary",
]
