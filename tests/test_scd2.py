"""SCD2 storage merge semantics: open/close/keep, slice isolation,
backfill (non-chronological) writes, version GC."""

from __future__ import annotations

import datetime

from diseasystore_spark.storage.scd2 import ParquetFeatureStore, normalize_slice_ts

T = datetime.datetime
D = datetime.date


def _df(spark, rows):
    return spark.createDataFrame(rows, "key_id string, v double")


def test_open_close_keep(spark, store_root):
    be = ParquetFeatureStore(spark, store_root)
    t1, t2 = T(2024, 1, 1), T(2024, 1, 2)

    be.update_snapshot(_df(spark, [("a", 1.0), ("b", 2.0)]), "ds.t", t1)
    snap1 = {r["key_id"]: r["v"] for r in be.get_table("ds.t", t1).collect()}
    assert snap1 == {"a": 1.0, "b": 2.0}

    # b changes value, c appears, a unchanged
    be.update_snapshot(_df(spark, [("a", 1.0), ("b", 9.0), ("c", 3.0)]), "ds.t", t2)
    snap2 = {r["key_id"]: r["v"] for r in be.get_table("ds.t", t2).collect()}
    assert snap2 == {"a": 1.0, "b": 9.0, "c": 3.0}
    # slice isolation: t1 still sees the old world
    snap1_again = {r["key_id"]: r["v"] for r in be.get_table("ds.t", t1).collect()}
    assert snap1_again == {"a": 1.0, "b": 2.0}


def test_row_deletion_closes(spark, store_root):
    be = ParquetFeatureStore(spark, store_root)
    t1, t2, t3 = T(2024, 1, 1), T(2024, 1, 2), T(2024, 1, 3)
    be.update_snapshot(_df(spark, [("a", 1.0), ("b", 2.0)]), "ds.t", t1)
    be.update_snapshot(_df(spark, [("a", 1.0)]), "ds.t", t2)
    assert {r["key_id"] for r in be.get_table("ds.t", t2).collect()} == {"a"}
    # reappearing row re-opens at t3
    be.update_snapshot(_df(spark, [("a", 1.0), ("b", 2.0)]), "ds.t", t3)
    assert {r["key_id"] for r in be.get_table("ds.t", t3).collect()} == {"a", "b"}
    raw = be.read_raw("ds.t")
    b_rows = raw.where(raw["key_id"] == "b").collect()
    assert len(b_rows) == 2  # closed interval + reopened interval


def test_backfill_earlier_slice(spark, store_root):
    """enforce_chronological_order=FALSE semantics: a write at an
    earlier slice_ts affects that slice without disturbing later ones."""
    be = ParquetFeatureStore(spark, store_root)
    t1, t2 = T(2024, 1, 1), T(2024, 2, 1)
    be.update_snapshot(_df(spark, [("a", 1.0)]), "ds.t", t2)
    be.update_snapshot(_df(spark, [("z", 9.0)]), "ds.t", t1)  # backfill
    assert {r["key_id"] for r in be.get_table("ds.t", t1).collect()} == {"z"}
    later = {r["key_id"] for r in be.get_table("ds.t", t2).collect()}
    assert "a" in later


def test_version_gc_keeps_two(spark, store_root):
    import os

    be = ParquetFeatureStore(spark, store_root)
    for i in range(4):
        be.update_snapshot(
            _df(spark, [("a", float(i))]), "ds.t", T(2024, 1, 1 + i)
        )
    tdir = os.path.join(store_root, "ds", "t")
    versions = sorted(e for e in os.listdir(tdir) if e.startswith("_v"))
    assert versions == ["_v3", "_v4"]


def test_normalize_slice_ts():
    assert normalize_slice_ts("2024-01-02") == T(2024, 1, 2)
    assert normalize_slice_ts("2024-01-02 09:30:00") == T(2024, 1, 2, 9, 30)
    assert normalize_slice_ts(D(2024, 1, 2)) == T(2024, 1, 2)
    assert normalize_slice_ts(T(2024, 1, 2, 5)) == T(2024, 1, 2, 5)


def test_fuzzy_date_match():
    from diseasystore_spark.sources.helpers import fuzzy_date_match

    files = [
        "2023-10-20_ILIARIRates.csv",
        "2023-10-27_ILIARIRates.csv",
        "2023-11-03_ILIARIRates.csv",
        "2023-10-25_Other.csv",
    ]
    pattern = r"[0-9]{4}-[0-9]{2}-[0-9]{2}_ILIARIRates\.csv"
    assert (
        fuzzy_date_match(files, D(2023, 10, 28), pattern)
        == "2023-10-27_ILIARIRates.csv"
    )
    assert (
        fuzzy_date_match(files, D(2023, 10, 27), pattern)
        == "2023-10-27_ILIARIRates.csv"
    )
    assert fuzzy_date_match(files, D(2023, 10, 1), pattern) is None


def test_source_conn_path(tmp_path):
    from diseasystore_spark.sources.helpers import source_conn_path

    (tmp_path / "by-age.csv.gz").write_text("x")
    assert source_conn_path(str(tmp_path), "by-age.csv").endswith("by-age.csv.gz")
    assert (
        source_conn_path("https://example.com/data/", "f.csv")
        == "https://example.com/data/f.csv"
    )


def test_append_only_merge_never_closes(spark, store_root, tmp_path):
    """close_absent=False: successive incremental batches accumulate;
    absence never closes; replay inserts nothing (no version bump)."""
    for gran, root in ((None, store_root), ("month", str(tmp_path / "pm"))):
        be = ParquetFeatureStore(spark, root, partition_granularity=gran)
        t1, t2 = T(2024, 1, 1), T(2024, 2, 2)
        df1 = spark.createDataFrame(
            [("a", 1.0, D(2024, 1, 1)), ("b", 2.0, D(2024, 1, 5))],
            "key_id string, v double, valid_from date",
        )
        df2 = spark.createDataFrame(
            [("c", 3.0, D(2024, 2, 1))],
            "key_id string, v double, valid_from date",
        )
        be.update_snapshot(df1, "ds.t", t1, close_absent=False)
        be.update_snapshot(df2, "ds.t", t2, close_absent=False)
        snap = {r["key_id"] for r in be.get_table("ds.t", t2).collect()}
        assert snap == {"a", "b", "c"}, gran
        # earlier slice sees only batch 1
        assert {
            r["key_id"] for r in be.get_table("ds.t", t1).collect()
        } == {"a", "b"}, gran
        # replayed batch is a no-op: no new version
        v = be._current_version("ds.t")
        be.update_snapshot(df2, "ds.t", t2, close_absent=False)
        assert be._current_version("ds.t") == v, gran
        assert be.read_raw("ds.t").where("until_ts IS NOT NULL").count() == 0
