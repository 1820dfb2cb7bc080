"""diseasystore_spark — a PySpark-native bitemporal feature-store engine.

A from-scratch re-implementation of the query and data-processing
capabilities of the R package ``diseasystore`` (ssi-dk/diseasystore),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by
Catalyst, an SCD2 versioned parquet store, and interval-algebra
operators (interlace, truncation, delta-counting prevalence).

The public surface mirrors the reference's behavior (see SURVEY.md for
the file:line parity map) but the execution strategy is idiomatic
Spark: declarative plans, broadcast small dims, sequence/explode date
spines, window cumsum, no driver-side row loops.
"""

from diseasystore_spark.config import diseasyoption, set_diseasyoption
from diseasystore_spark.contract import (
    key_columns,
    payload_columns,
    validate_feature_frame,
)
from diseasystore_spark.functions.age import add_years, age_labels, age_on_date
from diseasystore_spark.operators.aggregators import (
    key_join_count,
    key_join_max,
    key_join_min,
    key_join_sum,
)
from diseasystore_spark.operators.interlace import interlace, truncate_interlace
from diseasystore_spark.plans.feature_handler import FeatureHandler
from diseasystore_spark.plans.store import Diseasystore, drop_diseasystore

__all__ = [
    "Diseasystore",
    "FeatureHandler",
    "add_years",
    "age_labels",
    "age_on_date",
    "diseasyoption",
    "drop_diseasystore",
    "interlace",
    "key_columns",
    "key_join_count",
    "key_join_max",
    "key_join_min",
    "key_join_sum",
    "payload_columns",
    "set_diseasyoption",
    "truncate_interlace",
    "validate_feature_frame",
]

__version__ = "0.1.0"
