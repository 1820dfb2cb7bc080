"""A Diseasystore over the TPC-H-ish driver testdata.

Serves as the engine's end-to-end validation workload (the analog of
the reference's bundled stores): features are framed from the
``orders`` / ``customer`` / ``nation`` parquet tables with
interval-validity semantics, so every engine operator — SCD2 storage,
missing-range memoization, interlace, delta-count prevalence — runs
against realistic relational data.

Feature framing:

- ``n_active_orders`` (observable): one row per order, value 1.0,
  valid for 30 days from the order date — daily prevalence is then
  "orders active on that day" (occupancy semantics, like the
  reference's hospital-admission features). Carries
  ``priority`` as an extra payload for expression stratification.
- ``nation`` (stratification): customer -> nation name, valid from
  1992-01-01 forever (broadcast-joined dimension).
- ``birth`` (stratification): synthetic deterministic birth date per
  customer (drives the age pipeline: ``age_on_date`` + ``cut_expr``).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diseasystore_spark.operators.aggregators import key_join_max, key_join_sum
from diseasystore_spark.plans.feature_handler import FeatureHandler
from diseasystore_spark.plans.store import Diseasystore

EPOCH = datetime.date(1992, 1, 1)


def _orders(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _compute_order_activity(start_date, end_date, slice_ts, source_conn, ds):
    orders = _orders(ds.spark, source_conn)
    vf = F.col("o_orderdate").cast("date")
    framed = orders.select(
        F.col("o_custkey").alias("key_cust"),
        # key_order keeps rows unique under SCD2 checksum set-semantics
        # (two identical orders must remain two feature rows).
        F.col("o_orderkey").alias("key_order"),
        F.lit(1.0).alias("n_active_orders"),
        F.col("o_orderpriority").alias("priority"),
        vf.alias("valid_from"),
        F.date_add(vf, 30).alias("valid_until"),
    )
    # Only rows overlapping the requested range (predicate reaches the
    # parquet scan via pushdown on o_orderdate-derived columns).
    return framed.where(
        (F.col("valid_from") <= F.lit(end_date))
        & (F.col("valid_until") > F.lit(start_date))
    )


def _compute_customer_nation(start_date, end_date, slice_ts, source_conn, ds):
    customer = ds.spark.read.parquet(f"{source_conn}/customer.parquet")
    nation = ds.spark.read.parquet(f"{source_conn}/nation.parquet")
    return (
        customer.join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .select(
            F.col("c_custkey").alias("key_cust"),
            F.col("n_name").alias("nation"),
            F.lit(EPOCH).alias("valid_from"),
            F.lit(None).cast("date").alias("valid_until"),
        )
    )


def _compute_customer_birth(start_date, end_date, slice_ts, source_conn, ds):
    customer = ds.spark.read.parquet(f"{source_conn}/customer.parquet")
    return customer.select(
        F.col("c_custkey").alias("key_cust"),
        F.date_add(
            F.lit(datetime.date(1920, 1, 1)),
            (F.col("c_custkey") % 25000).cast("int"),
        ).alias("birth"),
        F.lit(EPOCH).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_until"),
    )


def _compute_supplier_ship_qty(start_date, end_date, slice_ts, source_conn, ds):
    """Max-aggregated observable: per-lineitem shipped quantity, valid
    for 7 days from ship date, keyed by supplier (exercises
    key_join_max through the prevalence pipeline).

    Carries ``key_cust`` (via the order) so the feature shares a key
    with the customer-keyed stratifications — the reference's bundled
    stores keep every feature interlace-compatible (a combination with
    no common keys would hard-fail ``truncate_interlace``,
    ``R/truncate_interlace.R:100``, which the exported conformance
    matrix does not tolerate)."""
    li = ds.spark.read.parquet(f"{source_conn}/lineitem.parquet")
    orders = ds.spark.read.parquet(f"{source_conn}/orders.parquet").select(
        F.col("o_orderkey"), F.col("o_custkey")
    )
    vf = F.col("l_shipdate").cast("date")
    framed = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        F.col("o_custkey").alias("key_cust"),
        F.col("l_suppkey").alias("key_supp"),
        F.col("l_orderkey").alias("key_order"),
        F.col("l_linenumber").alias("key_line"),
        F.col("l_quantity").cast("double").alias("n_ship_qty"),
        vf.alias("valid_from"),
        F.date_add(vf, 7).alias("valid_until"),
    )
    return framed.where(
        (F.col("valid_from") <= F.lit(end_date))
        & (F.col("valid_until") > F.lit(start_date))
    )


class TpchDiseasystore(Diseasystore):
    _ds_map = {
        "n_active_orders": "order_activity",
        "n_ship_qty": "supplier_ship_qty",
        "nation": "customer_nation",
        "birth": "customer_birth",
    }
    _label = "TPC-H testdata store"

    order_activity = FeatureHandler(
        compute=_compute_order_activity, key_join=key_join_sum
    )
    supplier_ship_qty = FeatureHandler(
        compute=_compute_supplier_ship_qty, key_join=key_join_max
    )
    customer_nation = FeatureHandler(
        compute=_compute_customer_nation, key_join=key_join_sum
    )
    customer_birth = FeatureHandler(
        compute=_compute_customer_birth, key_join=key_join_sum
    )
