"""ORC source/sink round trip (sources/orc)."""

from __future__ import annotations

import pytest

from diseasystore_spark.sources.orc import read_orc, write_orc


def test_orc_roundtrip_lossless(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", None), (2, None, 2.5), (3, "gamma", -0.0)],
        "id bigint, name string, score double",
    )
    path = str(tmp_path / "orc_data")
    write_orc(df, path, n_files=2)
    back = read_orc(spark, path, "id bigint, name string, score double")
    assert back.schema == df.schema
    assert sorted(
        (r["id"], r["name"], r["score"]) for r in back.collect()
    ) == sorted((r["id"], r["name"], r["score"]) for r in df.collect())
    # n_files pins the fan-out.
    files = [p for p in (tmp_path / "orc_data").iterdir()
             if p.name.endswith(".orc") or p.name.startswith("part-")]
    assert len([p for p in files if not p.name.startswith("_")]) == 2


def test_orc_schema_pin_prunes_and_orders(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10)], "id bigint, name string, extra bigint"
    )
    path = str(tmp_path / "orc_pruned")
    write_orc(df, path)
    back = read_orc(spark, path, "name string, id bigint")
    assert [f.name for f in back.schema.fields] == ["name", "id"]
    assert back.collect()[0]["name"] == "a"


def test_orc_type_drift_converts_or_fails(spark, tmp_path):
    # Measured Spark ORC semantics the read_orc docstring documents:
    # convertible scalar drift CONVERTS; structural drift RAISES.
    df = spark.createDataFrame([(1, "a")], "id bigint, name string")
    path = str(tmp_path / "orc_drift")
    write_orc(df, path)
    assert read_orc(spark, path, "id string, name string").collect()[0][
        "id"
    ] == "1"
    bad = read_orc(spark, path, "id array<int>, name string")
    with pytest.raises(Exception):
        bad.collect()


def test_orc_scan_gets_pushdown_and_pruning(spark, tmp_path):
    """The interop claim in sources/orc.py, proven at the plan level:
    an ORC scan gets the same machinery as parquet — the filter lands
    in PushedFilters and the projection prunes ReadSchema."""
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(100)],
        "id bigint, name string, score double",
    )
    path = str(tmp_path / "orc_plan")
    write_orc(df, path, n_files=2)
    back = read_orc(
        spark, path, "id bigint, name string, score double"
    ).where("id <= 10").select("id", "name")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "FileScan orc" in plan, plan
    assert "PushedFilters: [" in plan and "LessThanOrEqual(id,10" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "name" in read_schema and "score" not in read_schema
