"""interlace / truncate_interlace conformance.

Mirrors ``tests/testthat/test-truncate_interlace.R`` (property tester
:86-103, permutations :110-131, order invariance :135-143, list
conversion :146-154) plus a hand-computed golden alignment.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from diseasystore_spark.operators.interlace import interlace, truncate_interlace
from tests.fixtures import interlace_xyz, primaries

D = datetime.date


def _min_max(df, col):
    row = df.select(
        F.min(col).alias("mn"),
        F.max(col).alias("mx"),
        F.sum(F.col(col).isNull().cast("int")).alias("nulls"),
    ).first()
    return row["mn"], row["mx"], row["nulls"]


def interlace_tester(primary, secondary, output):
    """The reference property (``test-truncate_interlace.R:87-103``):
    min(valid_from) = max over (secondary mins, primary min);
    max(valid_until) with R `max` NA semantics — any NULL propagates."""
    p_min, p_max, p_nulls = _min_max(primary, "valid_from")
    pu_min, pu_max, pu_nulls = _min_max(primary, "valid_until")
    sec_min = []
    sec_max_is_null = False
    for s in secondary:
        smn, _, _ = _min_max(s, "valid_from")
        _, smx, snulls = _min_max(s, "valid_until")
        sec_min.append(smn)
        if snulls > 0:
            sec_max_is_null = True
    expected_min = max(min(sec_min), p_min)

    o_min, _, _ = _min_max(output, "valid_from")
    _, o_max, o_nulls = _min_max(output, "valid_until")
    assert o_min == expected_min
    if sec_max_is_null or pu_nulls > 0:
        assert o_nulls > 0, "expected open-ended rows in output"
    else:
        pass  # bounded case handled by golden tests


def test_truncate_interlace_properties(spark):
    x, y, z = interlace_xyz(spark)
    p1, p2, p3 = primaries(spark)
    for p in (p1, p2, p3):
        for secondary in ([x], [x, y], [x, y, z]):
            out = truncate_interlace(p, secondary)
            interlace_tester(p, secondary, out)


def test_truncate_interlace_no_secondary(spark):
    p1, _, _ = primaries(spark)
    assert truncate_interlace(p1) is p1
    assert truncate_interlace(p1, None) is p1
    assert truncate_interlace(p1, []) is p1


def _sorted_rows(df):
    cols = sorted(df.columns)
    return [tuple(r[c] for c in cols) for r in df.select(cols).collect()].__class__(
        sorted(
            [tuple(r[c] for c in cols) for r in df.select(cols).collect()],
            key=lambda t: tuple((v is None, v) for v in t),
        )
    )


def test_order_invariance(spark):
    """Result invariant under secondary-list permutation
    (``test-truncate_interlace.R:135-143``)."""
    x, y, z = interlace_xyz(spark)
    _, _, p3 = primaries(spark)
    a = truncate_interlace(p3, [x, y, z])
    b = truncate_interlace(p3, [y, x, z])
    assert sorted(a.columns) == sorted(b.columns)
    assert _sorted_rows(a) == _sorted_rows(b)


def test_single_secondary_list_conversion(spark):
    x, y, _ = interlace_xyz(spark)
    a = truncate_interlace(x, y)
    b = truncate_interlace(x, [y])
    assert _sorted_rows(a) == _sorted_rows(b)


def test_interlace_golden(spark):
    """Hand-computed temporal alignment."""
    a = spark.createDataFrame(
        [
            ("k1", 1.0, D(2020, 1, 1), D(2020, 3, 1)),
            ("k1", 2.0, D(2020, 3, 1), None),
        ],
        "key_k string, a double, valid_from date, valid_until date",
    )
    b = spark.createDataFrame(
        [("k1", 9.0, D(2020, 2, 1), D(2020, 4, 1))],
        "key_k string, b double, valid_from date, valid_until date",
    )
    out = interlace([a, b], by=["key_k"])
    rows = {
        (r["valid_from"], r["valid_until"]): (r["a"], r["b"])
        for r in out.collect()
    }
    assert rows == {
        (D(2020, 1, 1), D(2020, 2, 1)): (1.0, None),
        (D(2020, 2, 1), D(2020, 3, 1)): (1.0, 9.0),
        (D(2020, 3, 1), D(2020, 4, 1)): (2.0, 9.0),
        (D(2020, 4, 1), None): (2.0, None),
    }


def test_truncate_interlace_open_ended_quirk(spark):
    """A bounded primary clipped against an open-ended secondary yields
    an open-ended row (CASE-WHEN three-valued logic — the reference
    tester asserts NA max, ``test-truncate_interlace.R:97-101``)."""
    p = spark.createDataFrame(
        [("k1", D(1995, 1, 1), D(2005, 1, 1))],
        "key_k string, valid_from date, valid_until date",
    )
    s = spark.createDataFrame(
        [("k1", 5.0, D(1990, 1, 1), None)],
        "key_k string, v double, valid_from date, valid_until date",
    )
    s2 = spark.createDataFrame(
        [("k1", 7.0, D(1990, 1, 1), D(2000, 1, 1))],
        "key_k string, w double, valid_from date, valid_until date",
    )
    out = truncate_interlace(p, [s, s2]).collect()
    intervals = sorted(
        ((r["valid_from"], r["valid_until"]) for r in out),
        key=lambda t: (t[0], t[1] is None, t[1]),
    )
    assert intervals == [
        (D(1995, 1, 1), D(2000, 1, 1)),
        (D(2000, 1, 1), None),
    ]
    by_iv = {
        (r["valid_from"], r["valid_until"]): (r["v"], r["w"]) for r in out
    }
    assert by_iv[(D(1995, 1, 1), D(2000, 1, 1))] == (5.0, 7.0)
    assert by_iv[(D(2000, 1, 1), None)] == (5.0, None)


def test_no_common_keys_errors(spark):
    p = spark.createDataFrame(
        [("a", D(2020, 1, 1), None)],
        "key_a string, valid_from date, valid_until date",
    )
    s = spark.createDataFrame(
        [("b", 1.0, D(2020, 1, 1), None)],
        "key_b string, v double, valid_from date, valid_until date",
    )
    with pytest.raises(ValueError, match="No common keys"):
        truncate_interlace(p, [s])


@pytest.mark.parametrize("bucket_days", [1, 93, 4000])
def test_bucketed_interlace_equals_default(spark, bucket_days):
    """The range-join bucketing scale path must be a pure physical
    rewrite: identical rows for any bucket width (narrower / wider
    than the fixtures' interval spans, and a single giant bucket)."""
    x, y, z = interlace_xyz(spark)
    _, p2, p3 = primaries(spark)
    for p in (p2, p3):
        a = truncate_interlace(p, [x, y, z])
        b = truncate_interlace(p, [x, y, z], bucket_days=bucket_days)
        assert sorted(a.columns) == sorted(b.columns)
        assert _sorted_rows(a) == _sorted_rows(b.select(a.columns))


def test_bucketed_interlace_golden_and_open_intervals(spark):
    """Bucketed path across bucket boundaries with NULL-open rows on
    both sides (the global-max cap path)."""
    a = spark.createDataFrame(
        [
            ("k1", 1.0, D(2020, 1, 1), D(2020, 3, 1)),
            ("k1", 2.0, D(2020, 3, 1), None),
            (None, 3.0, D(2020, 1, 15), None),  # NULL key (eqNullSafe)
        ],
        "key_k string, a double, valid_from date, valid_until date",
    )
    b = spark.createDataFrame(
        [
            ("k1", 9.0, D(2020, 2, 1), D(2020, 4, 1)),
            (None, 8.0, D(2020, 2, 1), D(2020, 2, 10)),
        ],
        "key_k string, b double, valid_from date, valid_until date",
    )
    plain = interlace([a, b], by=["key_k"])
    bucketed = interlace([a, b], by=["key_k"], bucket_days=7)
    assert _sorted_rows(plain) == _sorted_rows(bucketed.select(plain.columns))


def test_bucketed_interlace_plan_is_equi_on_bucket(spark):
    """The physical plan must carry the bucket id as an equi join key
    (hash/sort-merge keys), not as a filter residual."""
    x, y, _ = interlace_xyz(spark)
    _, p2, _ = primaries(spark)
    plan = (
        truncate_interlace(p2, [x, y], bucket_days=30)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    joins = [
        ln
        for ln in plan.splitlines()
        if ("SortMergeJoin" in ln or "ShuffledHashJoin" in ln)
        and "__bkt" in ln
    ]
    assert joins, f"no join keyed on the bucket column in plan:\n{plan}"


def test_bucketed_interlace_spine_window_is_bucket_partitioned(spark):
    """On the scale path the spine's lead window must partition on
    (keys, bucket), never on the keys alone — otherwise one hot key
    sorts all its breakpoints in a single window task. Every window in
    the bucketed plan must carry __bktl in its partition spec (the
    boundary frame's per-key window is over the tiny per-bucket-min
    frame and orders BY __bktl, which also satisfies the check)."""
    x, y, _ = interlace_xyz(spark)
    _, p2, _ = primaries(spark)
    plan = (
        truncate_interlace(p2, [x, y], bucket_days=30)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert windows, f"no window in bucketed plan:\n{plan}"
    bad = [ln for ln in windows if "__bkt" not in ln]
    assert not bad, f"window not bucket-partitioned:\n{bad}"


def test_bucketed_interlace_single_key_skew_bounded(spark):
    """Perf-regression guard for the worst-case key skew (VERDICT r2
    #3): a single-nation feature pair puts every interval row in ONE
    key group, so the plain spine containment join degenerates to
    |spine| x |rows| comparisons in a single task. The bucketed path
    must stay wall-time bounded at a size where the plain path's
    single-group quadratic visibly dominates (measured numbers in
    NOTES.md). The generous absolute bound keeps the test meaningful
    without being VM-noise flaky."""
    import datetime
    import time

    n = 30_000
    base = spark.range(n).select(
        F.lit("DK").alias("key_nation"),
        F.col("id"),
        F.date_add(
            F.lit(datetime.date(2000, 1, 1)), (F.col("id") % 3650).cast("int")
        ).alias("valid_from"),
    )
    a = base.select(
        "key_nation",
        (F.col("id") % 97).cast("double").alias("n_cases"),
        "valid_from",
        F.date_add("valid_from", (F.col("id") % 30 + 1).cast("int")).alias(
            "valid_until"
        ),
    ).localCheckpoint()
    b = base.select(
        "key_nation",
        (F.col("id") % 13).cast("double").alias("n_tests"),
        F.date_add("valid_from", 3).alias("valid_from"),
        F.date_add("valid_from", (F.col("id") % 45 + 5).cast("int")).alias(
            "valid_until"
        ),
    ).localCheckpoint()
    t0 = time.perf_counter()
    cnt = truncate_interlace(a, [b], bucket_days=30).count()
    dt = time.perf_counter() - t0
    assert cnt > 0
    assert dt < 120, f"bucketed skew interlace took {dt:.1f}s"


def _skewed_pair(spark, n=3000, keys=1):
    """n SEQUENTIAL (SCD2-style, non-overlapping per key) interval
    rows spread over ``keys`` distinct key values — hot keys without a
    combinatorial join blow-up."""
    per_key = max(n // keys, 1)
    base = spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % keys)).alias("key_k"),
        F.col("id"),
        F.date_add(
            F.lit(D(2000, 1, 1)), (F.col("id") / keys).cast("int")
        ).alias("valid_from"),
    )
    a = base.select(
        "key_k",
        (F.col("id") % 97).cast("double").alias("n_cases"),
        "valid_from",
        F.date_add("valid_from", 1).alias("valid_until"),
    )
    b = base.select(
        "key_k",
        (F.col("id") % 13).cast("double").alias("n_tests"),
        F.date_add("valid_from", per_key).alias("valid_from"),
        F.date_add("valid_from", per_key + 1).alias("valid_until"),
    )
    c = base.select(
        "key_k",
        (F.col("id") % 7).cast("double").alias("n_admits"),
        F.date_add("valid_from", 2 * per_key).alias("valid_from"),
        F.date_add("valid_from", 2 * per_key + 1).alias("valid_until"),
    )
    return a.localCheckpoint(), b.localCheckpoint(), c.localCheckpoint()


def test_auto_bucket_selects_on_hot_keys_and_skips_on_wide_keys(spark):
    """``resolve_bucket_days`` must switch the bucketed path ON for a
    low-cardinality corpus (rows-per-key above threshold) and OFF for
    a high-cardinality one — and the auto plan must carry the bucket
    id as an equi join key, with rows identical to the forced plain
    path."""
    from diseasystore_spark.operators.interlace import resolve_bucket_days

    hot_a, hot_b, hot_c = _skewed_pair(spark, n=3000, keys=1)
    w = resolve_bucket_days([hot_a, hot_b], ["key_k"], auto_threshold=1000)
    assert isinstance(w, int) and w >= 1

    wide_a, wide_b, wide_c = _skewed_pair(spark, n=3000, keys=3000)
    assert (
        resolve_bucket_days([wide_a, wide_b], ["key_k"], auto_threshold=1000)
        is None
    )

    auto = truncate_interlace(hot_a, [hot_b, hot_c], auto_threshold=1000)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert any(
        "Join" in ln and "__bkt" in ln for ln in plan.splitlines()
    ), f"auto path did not bucket the containment join:\n{plan}"

    plain = truncate_interlace(hot_a, [hot_b, hot_c], bucket_days=None)
    wide_auto = truncate_interlace(
        wide_a, [wide_b, wide_c], auto_threshold=1000
    )
    assert "__bkt" not in (
        wide_auto._jdf.queryExecution().executedPlan().toString()
    )
    assert _sorted_rows(auto.select(plain.columns)) == _sorted_rows(plain)


def test_auto_bucket_rejects_bad_widths(spark):
    a, b, _ = _skewed_pair(spark, n=50, keys=5)
    with pytest.raises(ValueError, match="bucket_days"):
        interlace([a, b], by=["key_k"], bucket_days=0)
    with pytest.raises(ValueError, match="bucket_days"):
        interlace([a, b], by=["key_k"], bucket_days="weekly")
