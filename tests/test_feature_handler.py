"""FeatureHandler extensibility surface (X1-X3): custom compute, custom
get, custom key_join aggregator."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from diseasystore_spark import Diseasystore, FeatureHandler, key_join_sum

D = datetime.date
TODAY = D(2024, 6, 1)


def _mk_frame(spark, n=10):
    return spark.range(1, n + 1).select(
        F.concat(F.lit("k"), F.col("id")).alias("key_k"),
        (F.col("id") * 2.0).alias("n_val"),
        F.date_sub(F.lit(TODAY), (F.col("id") * 3).cast("int")).alias("valid_from"),
        F.date_sub(F.lit(TODAY), (F.col("id") * 3 - 5).cast("int")).alias(
            "valid_until"
        ),
    )


GET_CALLS = []


def _custom_get(target_table, slice_ts, store):
    """Custom snapshot reader (X2): the default SCD2 read plus an
    audit marker column, proving dispatch goes through the hook."""
    GET_CALLS.append(target_table)
    out = store.backend.get_table(target_table, slice_ts)
    return out.withColumn("n_val", F.col("n_val") * 10)


def _custom_key_join(grouped, feature):
    """Custom aggregator (X3/UDAF surface): sum of squares."""
    return grouped.agg(F.sum(F.col(feature) * F.col(feature)).alias("n"))


class CustomStore(Diseasystore):
    _ds_map = {"n_val": "h_val", "n_sq": "h_sq"}

    h_val = FeatureHandler(
        compute=lambda start_date, end_date, slice_ts, source_conn, ds: _mk_frame(
            ds.spark
        ),
        get=_custom_get,
        key_join=key_join_sum,
    )
    h_sq = FeatureHandler(
        compute=lambda start_date, end_date, slice_ts, source_conn, ds: (
            _mk_frame(ds.spark).withColumnRenamed("n_val", "n_sq")
        ),
        key_join=_custom_key_join,
    )


@pytest.fixture()
def store(spark, tmp_path):
    GET_CALLS.clear()
    return CustomStore(
        spark,
        target_conn=str(tmp_path / "cs"),
        source_conn="x",
        slice_ts=TODAY,
        verbose=False,
    )


def test_custom_get_dispatch(store):
    start, end = TODAY - datetime.timedelta(days=30), TODAY
    out = store.get_feature("n_val", start, end)
    rows = {r["key_k"]: r["n_val"] for r in out.collect()}
    assert GET_CALLS == ["ds.h_val"]
    # values are scaled by the custom reader (stored values x10)
    assert all(v % 20 == 0 for v in rows.values())


def test_custom_aggregator_through_prevalence(store):
    start, end = TODAY - datetime.timedelta(days=30), TODAY
    out = store.key_join_features("n_sq", None, start, end).collect()
    by_date = {r["date"]: r["n_sq"] for r in out}
    # spot-check one day: ids valid on TODAY-10 (interval
    # [TODAY-3i, TODAY-3i+5)): 2 <= i <= 3 -> values 4,6 -> sum sq 52
    probe = TODAY - datetime.timedelta(days=10)
    assert by_date[probe] == sum(
        (i * 2.0) ** 2 for i in range(1, 11) if 3 * i - 5 < 10 <= 3 * i
    )


def test_missing_handler_errors(spark, tmp_path):
    class Broken(Diseasystore):
        _ds_map = {"n_x": "nope"}

    ds = Broken(spark, target_conn=str(tmp_path / "b"), source_conn="x")
    with pytest.raises(KeyError, match="no FeatureHandler"):
        ds.get_feature("n_x", TODAY, TODAY)


def test_unconfigured_compute_errors():
    h = FeatureHandler()
    with pytest.raises(NotImplementedError, match="compute not configured"):
        h.compute()
    with pytest.raises(NotImplementedError, match="key_join not configured"):
        h.key_join(None, "x")
