"""Bucketing evidence for SCALE.md: feature tables bucketed on the
join key co-locate the interlace-style join — the sort-merge join
reads bucketed scans with NO shuffle exchange on either side."""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed_tables(spark):
    a = spark.range(0, 10_000).selectExpr(
        "concat('k', id % 500) AS key_name", "CAST(id AS DOUBLE) AS mpg"
    )
    b = spark.range(0, 10_000).selectExpr(
        "concat('k', id % 500) AS key_name", "CAST(id * 2 AS DOUBLE) AS wt"
    )
    for name, df in [("bk_a", a), ("bk_b", b)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "key_name")
            .sortBy("key_name")
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "bk_a", "bk_b"
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ta, tb = bucketed_tables
    # force the merge strategy (small test tables would otherwise
    # broadcast, which proves nothing about bucketing)
    joined = spark.table(ta).hint("merge").join(
        spark.table(tb).hint("merge"), "key_name"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan, (
        "bucketed join should not shuffle:\n" + plan[:2000]
    )
    assert joined.count() == 10_000 * 20  # 500 keys x 20 x 20 rows
