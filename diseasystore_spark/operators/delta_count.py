"""Delta counting + date-spine cumulative prevalence.

The reference's stratified-aggregation tail
(``R/DiseasystoreBase.R:455-499``): interval-valid feature rows are
converted to per-day deltas (grouped on ``date = valid_from`` for
additions and ``date = valid_until`` for removals, each through the
feature's aggregator), densified over a daily spine x distinct strata,
and turned into point-in-time prevalence with a cumulative-sum window.

Spark-first notes:

- The spine is ``sequence``/``explode`` (JVM-side), crossJoined with
  the distinct strata — the spine side is tiny and broadcast.
- For the built-in sum/count aggregators the two delta aggregations
  fuse into a single pass: each interval row explodes into a
  (+delta at valid_from, -delta at valid_until) pair and one groupBy
  computes the net per (strata, date) — half the shuffle volume and
  one aggregation instead of two, with identical results
  (``cumsum(add) - cumsum(remove) == cumsum(net)``; deltas are
  NULL-skipped by ``sum`` exactly like the two-pass form). Any other
  aggregator keeps the general two-``groupBy`` path so the pluggable
  ``FeatureHandler.key_join`` surface stays fully general.
- Null-safe joins (``na_matches = "na"`` at
  ``R/DiseasystoreBase.R:491-492``) use ``eqNullSafe`` so NULL strata
  values group correctly.
- The cumsum window partitions by strata and orders by date. When
  strata cardinality is low, all data lands in few window partitions;
  the rows per (strata) after densification = days-in-window, bounded
  and small, so this is safe at scale (the heavy data was already
  reduced by the delta aggregation).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diseasystore_spark.functions.dates import date_spine
from diseasystore_spark.operators.aggregators import (
    Aggregator,
    key_join_count,
    key_join_sum,
)


def delta_count_prevalence(
    df: DataFrame,
    strata: dict[str, Column] | None,
    observable: str,
    aggregator: Aggregator,
    spark: SparkSession,
    start_date: datetime.date,
    end_date: datetime.date,
) -> DataFrame:
    """Compute per-day prevalence of ``observable`` per stratum.

    ``strata`` maps output column names to grouping expressions
    (already-resolved Columns); None/empty means no stratification.
    Returns columns ``(date, *strata, <observable>)``.
    """
    strata = strata or {}
    strata_names = list(strata.keys())

    # Evaluate stratification expressions once, up front, so grouping,
    # distinct-strata enumeration, and joins all see plain columns.
    work = df.withColumns(strata)

    spine = date_spine(spark, start_date, end_date)
    if strata_names:
        combos = work.select(*strata_names).distinct().crossJoin(F.broadcast(spine))
    else:
        combos = spine

    # The aggregated frames derive from the same lineage as ``combos``
    # (both trace to ``work``), so joining on same-named attributes
    # would rely on Spark's self-join disambiguation ("trivially true
    # equals predicate" warnings). Rename the right side's join keys to
    # unique temporaries so every predicate references distinct
    # attributes — no ambiguity for the analyzer to resolve.
    def rename_keys(right: DataFrame) -> DataFrame:
        return right.withColumnsRenamed(
            {"date": "__r_date", **{s: f"__r_{s}" for s in strata_names}}
        )

    def nullsafe_cond(left: DataFrame) -> Column:
        cond = left["date"] == F.col("__r_date")
        for s in strata_names:
            cond = cond & left[s].eqNullSafe(F.col(f"__r_{s}"))
        return cond

    w = (
        Window.partitionBy(*strata_names)
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    if aggregator in (key_join_sum, key_join_count):
        # Fused single-pass path: explode each interval into
        # (+delta, -delta) events and aggregate the net once.
        delta = (
            F.col(observable).cast("double")
            if aggregator is key_join_sum
            else F.lit(1.0)
        )
        events = work.select(
            *strata_names,
            F.explode(
                F.array(
                    F.struct(
                        F.col("valid_from").alias("date"),
                        delta.alias("delta"),
                    ),
                    F.struct(
                        F.col("valid_until").alias("date"),
                        (-delta).alias("delta"),
                    ),
                )
            ).alias("ev"),
        ).select(*strata_names, F.col("ev.date"), F.col("ev.delta"))
        net = events.groupBy(*strata_names, "date").agg(
            F.sum("delta").alias("net")
        )
        net = rename_keys(net)
        joined = combos.join(net, nullsafe_cond(combos), "left").select(
            combos["*"], F.coalesce(net["net"], F.lit(0.0)).alias("net")
        )
        return joined.select(
            "date",
            *strata_names,
            F.sum("net").over(w).alias(observable),
        )

    t_add = rename_keys(
        aggregator(
            work.groupBy(*strata_names, F.col("valid_from").alias("date")),
            observable,
        ).withColumnRenamed("n", "n_add")
    )
    t_remove = rename_keys(
        aggregator(
            work.groupBy(*strata_names, F.col("valid_until").alias("date")),
            observable,
        ).withColumnRenamed("n", "n_remove")
    )

    joined = combos.join(t_add, nullsafe_cond(combos), "left").select(
        combos["*"], t_add["n_add"]
    )
    joined = joined.join(t_remove, nullsafe_cond(joined), "left").select(
        joined["*"], t_remove["n_remove"]
    )
    joined = joined.fillna({"n_add": 0, "n_remove": 0})

    return joined.select(
        "date",
        *strata_names,
        (F.sum("n_add").over(w) - F.sum("n_remove").over(w)).alias(observable),
    )
