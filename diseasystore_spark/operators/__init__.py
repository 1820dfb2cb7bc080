from diseasystore_spark.operators.events import (
    contact_pairs,
    funnel_conversions,
    funnel_counts,
    funnel_reach,
    funnel_reach_joins,
    retention_cohorts,
    rolling_incidence,
    user_journeys,
)
from diseasystore_spark.operators.skyline import skyline
from diseasystore_spark.operators.stats import (
    equi_depth_histogram,
    group_trend,
    winsorized_stats,
)
from diseasystore_spark.operators.aggregators import (
    key_join_count,
    key_join_max,
    key_join_min,
    key_join_sum,
)
from diseasystore_spark.operators.delta_count import delta_count_prevalence
from diseasystore_spark.operators.interlace import interlace, truncate_interlace
from diseasystore_spark.operators.missing_ranges import (
    compact_date_ranges,
    missing_date_ranges,
)

__all__ = [
    "contact_pairs",
    "funnel_conversions",
    "funnel_counts",
    "funnel_reach",
    "funnel_reach_joins",
    "retention_cohorts",
    "rolling_incidence",
    "equi_depth_histogram",
    "group_trend",
    "winsorized_stats",
    "skyline",
    "user_journeys",
    "compact_date_ranges",
    "delta_count_prevalence",
    "interlace",
    "key_join_count",
    "key_join_max",
    "key_join_min",
    "key_join_sum",
    "missing_date_ranges",
    "truncate_interlace",
]
