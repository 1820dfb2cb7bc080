"""Robust-stats operators: winsorized moments, OLS trends, rolling
incidence, and conjunctive search — each pinned against an
independent Python/numpy oracle on randomized data plus crafted edge
cases (the same strategy as the other operator suites)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from diseasystore_spark.operators.events import rolling_incidence
from diseasystore_spark.operators.stats import group_trend, winsorized_stats
from diseasystore_spark.pipeline.text import search_all_terms


def test_winsorized_stats_matches_numpy(spark):
    rng = random.Random(42)
    rows = [
        (f"g{i % 3}", rng.randint(-1000, 100000)) for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["grp", "v"])
    got = {
        r["grp"]: r
        for r in winsorized_stats(df, "v", ["grp"], 0.1, 0.9).collect()
    }
    for g in ["g0", "g1", "g2"]:
        vals = np.array([v for k, v in rows if k == g], dtype=np.float64)
        lo = np.percentile(vals, 10, method="linear")
        hi = np.percentile(vals, 90, method="linear")
        clipped = np.clip(vals, lo, hi)
        r = got[g]
        assert r["n"] == len(vals)
        assert r["lo"] == pytest.approx(lo, abs=1e-9)
        assert r["hi"] == pytest.approx(hi, abs=1e-9)
        assert r["n_clip_lo"] == int((vals < lo).sum())
        assert r["n_clip_hi"] == int((vals > hi).sum())
        assert r["mean_winsorized"] == pytest.approx(
            clipped.mean(), rel=1e-12
        )


def test_winsorized_stats_degenerate_group(spark):
    # A constant group: thresholds collapse onto the value, nothing
    # clips, and the mean is the value itself.
    df = spark.createDataFrame([("g", 7)] * 5, ["grp", "v"])
    r = winsorized_stats(df, "v", ["grp"]).collect()[0]
    assert r["lo"] == r["hi"] == 7.0
    assert r["n_clip_lo"] == r["n_clip_hi"] == 0
    assert r["mean_winsorized"] == 7.0


def test_winsorized_stats_rejects_bad_percentiles(spark):
    df = spark.createDataFrame([("g", 1)], ["grp", "v"])
    with pytest.raises(ValueError, match="p_lo"):
        winsorized_stats(df, "v", ["grp"], p_lo=0.9, p_hi=0.1)


def test_group_trend_matches_numpy_polyfit(spark):
    rng = random.Random(7)
    rows = []
    for g in ["a", "b"]:
        for x in range(40):
            rows.append((g, x, 3 * x + rng.randint(-20, 20)))
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    got = {r["grp"]: r for r in group_trend(df, "x", "y", ["grp"]).collect()}
    for g in ["a", "b"]:
        xs = np.array([x for k, x, _ in rows if k == g], dtype=np.float64)
        ys = np.array([y for k, _, y in rows if k == g], dtype=np.float64)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert got[g]["slope"] == pytest.approx(slope, rel=1e-9)
        assert got[g]["intercept"] == pytest.approx(intercept, rel=1e-9)
        assert got[g]["n"] == len(xs)
        assert got[g]["sum_xy"] == int((xs * ys).sum())


def test_group_trend_constant_regressor_is_null(spark):
    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 2), ("g", 5, 3)], ["grp", "x", "y"]
    )
    r = group_trend(df, "x", "y", ["grp"]).collect()[0]
    assert r["slope"] is None and r["intercept"] is None
    assert r["sum_x"] == 15 and r["sum_xx"] == 75


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value",
    )


def test_rolling_incidence_dense_spine_and_growth(spark):
    # Type "a" has a 3-day gap; the spine must materialize the quiet
    # days with n_events = 0 and the trailing sums must count them.
    rows = []
    eid = 0
    for day, n in [(1, 2), (2, 1), (6, 3)]:
        for _ in range(n):
            rows.append((eid, f"1996-01-0{day} 10:00:00", 1, "a", 0.0))
            eid += 1
    rows.append((eid, "1996-01-03 09:00:00", 2, "b", 0.0))
    df = _mk_events(spark, rows)
    out = rolling_incidence(df, window=2)
    got = {
        (r["event_type"], str(r["day"])): r for r in out.collect()
    }
    # spine: both types span the GLOBAL range 01-01..01-06
    assert len(got) == 12
    assert got[("a", "1996-01-04")]["n_events"] == 0
    # window=2 trailing sums over the dense series
    assert got[("a", "1996-01-02")]["trail"] == 3
    assert got[("a", "1996-01-06")]["trail"] == 3  # day5=0 + day6=3
    # prior full only from rn >= 4 (2*window)
    assert got[("a", "1996-01-02")]["prior"] is None
    a4 = got[("a", "1996-01-04")]
    assert a4["prior"] == 3 and a4["trail"] == 0
    assert a4["growth"] == pytest.approx(0.0)
    # zero prior -> NULL growth, not a division error
    b4 = got[("b", "1996-01-04")]
    assert b4["prior"] == 0 and b4["growth"] is None
    # nonzero prior from a single event two windows back
    b6 = got[("b", "1996-01-06")]
    assert b6["prior"] == 1 and b6["growth"] == pytest.approx(0.0)


def test_rolling_incidence_matches_python_oracle(spark):
    rng = random.Random(3)
    rows = []
    for eid in range(300):
        day = rng.randint(1, 20)
        typ = rng.choice(["x", "y", "z"])
        rows.append((eid, f"1996-02-{day:02d} 12:00:00", eid % 7, typ, 1.0))
    df = _mk_events(spark, rows)
    w = 5
    got = {
        (r["event_type"], str(r["day"])): r
        for r in rolling_incidence(df, window=w).collect()
    }
    days = sorted({r[1][:10] for r in rows})
    lo, hi = days[0], days[-1]
    import datetime

    d0 = datetime.date.fromisoformat(lo)
    d1 = datetime.date.fromisoformat(hi)
    spine = [
        d0 + datetime.timedelta(days=i)
        for i in range((d1 - d0).days + 1)
    ]
    for typ in ["x", "y", "z"]:
        series = []
        for d in spine:
            n = sum(
                1 for r in rows
                if r[3] == typ and r[1][:10] == d.isoformat()
            )
            series.append(n)
        for i, d in enumerate(spine):
            r = got[(typ, d.isoformat())]
            assert r["n_events"] == series[i]
            assert r["trail"] == sum(series[max(0, i - w + 1): i + 1])
            if i >= 2 * w - 1:
                prior = sum(series[i - 2 * w + 1: i - w + 1])
                assert r["prior"] == prior
                if prior > 0:
                    assert r["growth"] == pytest.approx(
                        r["trail"] / prior
                    )
            else:
                assert r["prior"] is None


def test_search_all_terms_conjunctive_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "apple banana"),
            (3, "banana cherry banana apple apple apple"),
            (4, "cherry cherry"),
        ],
        ["doc_id", "text"],
    )
    out = search_all_terms(df, terms=["apple", "banana"], k=10).collect()
    # doc 4 lacks both, docs 1/2/3 contain both; score = tf sum
    assert [(r["doc_id"], r["score"], r["rank"]) for r in out] == [
        (3, 5, 1),
        (1, 3, 2),
        (2, 2, 3),
    ]


def test_search_all_terms_top_terms_mode_and_k(spark):
    df = spark.createDataFrame(
        [
            (1, "t t t u u v"),
            (2, "t u v v"),
            (3, "t t u"),
            (4, "w w w w w w w w"),
        ],
        ["doc_id", "text"],
    )
    # totals: w=8, t=6, u=4 -> query {w, t, u}; no doc has all three
    assert search_all_terms(df, top_terms=3, k=5).count() == 0
    # query {w, t} ties v at 3? totals: v=3; top2 = w(8), t(6)
    out = search_all_terms(df, top_terms=2, k=5).collect()
    assert out == []  # no doc contains both w and t
    out = search_all_terms(df, top_terms=1, k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in out] == [(4, 8)]


def test_search_all_terms_top_terms_exceeding_vocab(spark):
    """Regression (round-5 ADVICE): top_terms larger than the corpus
    vocabulary must fall back to the ACTUAL query size, not make the
    conjunctive check unsatisfiable and return silently empty."""
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, "a")], ["doc_id", "text"]
    )
    # vocabulary = {a, b} (2 terms) but top_terms=10: query is {a, b},
    # docs 1 and 2 contain both
    out = search_all_terms(df, top_terms=10, k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in out] == [(1, 3), (2, 2)]

    import pytest

    empty = spark.createDataFrame([(1, "   ")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="no terms"):
        search_all_terms(empty, top_terms=3, k=5)


def test_search_all_terms_arg_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="exactly one"):
        search_all_terms(df)
    with pytest.raises(ValueError, match="exactly one"):
        search_all_terms(df, terms=["a"], top_terms=2)


def test_cross_source_matrix_attribution(spark):
    from diseasystore_spark.pipeline.dedup import cross_source_matrix

    # Two identical docs across sources + one identical pair within a
    # source; identical text => identical signatures => est 1.0 (16
    # matching positions).
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon", "crawl"),
            (2, "alpha beta gamma delta epsilon", "curated"),
            (3, "alpha beta gamma delta epsilon", "crawl"),
            (4, "zeta eta theta iota kappa", "curated"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in cross_source_matrix(df, portable=True).collect()
    }
    assert out[("crawl", "curated")]["n_pairs"] == 2  # 1-2, 2-3
    assert out[("crawl", "crawl")]["n_pairs"] == 1  # 1-3
    assert out[("crawl", "curated")]["sum_sig_matches"] == 32
    assert ("curated", "curated") not in out


def _ntile_oracle(vals, k):
    """Python NTILE: per-bucket (count, lo, hi) over sorted values."""
    s = sorted(vals)
    n = len(s)
    q, rem = divmod(n, k)
    out = {}
    pos = 0
    for b in range(min(k, n) if q == 0 else k):
        size = (q + 1) if b < rem or q == 0 and b < n else q
        if q == 0:
            size = 1 if b < rem else 0
        if size == 0:
            continue
        chunk = s[pos: pos + size]
        out[b] = (len(chunk), chunk[0], chunk[-1])
        pos += size
    return out


def test_equi_depth_histogram_matches_ntile(spark):
    from diseasystore_spark.operators.stats import equi_depth_histogram

    rng = random.Random(11)
    # heavy ties (values drawn from a small domain) straddle bucket
    # boundaries — counts must still follow NTILE exactly
    vals = [rng.randint(0, 30) for _ in range(997)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {
        r["bucket"]: (r["n_rows"], r["lo"], r["hi"])
        for r in equi_depth_histogram(df, "v", n_buckets=16).collect()
    }
    assert got == _ntile_oracle(vals, 16)


def test_equi_depth_histogram_partition_invariance(spark):
    from diseasystore_spark.operators.stats import equi_depth_histogram

    rng = random.Random(13)
    vals = [rng.randint(-(10 ** 6), 10 ** 6) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    a = sorted(
        (r["bucket"], r["n_rows"], r["lo"], r["hi"])
        for r in equi_depth_histogram(df, "v", 8, partitions=2).collect()
    )
    b = sorted(
        (r["bucket"], r["n_rows"], r["lo"], r["hi"])
        for r in equi_depth_histogram(df, "v", 8, partitions=64).collect()
    )
    assert a == b == sorted(
        (k, *v) for k, v in _ntile_oracle(vals, 8).items()
    )


def test_equi_depth_histogram_fewer_rows_than_buckets(spark):
    from diseasystore_spark.operators.stats import equi_depth_histogram

    df = spark.createDataFrame([(3,), (1,), (2,)], ["v"])
    got = {
        r["bucket"]: (r["n_rows"], r["lo"], r["hi"])
        for r in equi_depth_histogram(df, "v", n_buckets=16).collect()
    }
    assert got == {0: (1, 1, 1), 1: (1, 2, 2), 2: (1, 3, 3)}


def test_bigram_pmi_matches_python(spark):
    import math
    from collections import Counter

    from diseasystore_spark.pipeline.text import bigram_pmi

    docs = [
        (1, "a b a b a b c"),
        (2, "a b c d c d"),
        (3, "x"),          # single token: no pairs, counts still in uni
        (4, "  "),         # empty after trim
        (5, "c d a b"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["w1"], r["w2"]): r
        for r in bigram_pmi(df, min_count=2).collect()
    }
    uni = Counter()
    bi = Counter()
    n_bi = 0
    for _, t in docs:
        toks = t.split()
        uni.update(toks)
        for x, y in zip(toks, toks[1:]):
            bi[(x, y)] += 1
            n_bi += 1
    n_uni = sum(uni.values())
    expect = {p: c for p, c in bi.items() if c >= 2}
    assert set(got) == set(expect)
    for (x, y), c in expect.items():
        r = got[(x, y)]
        assert r["c_pair"] == c
        assert r["c_w1"] == uni[x] and r["c_w2"] == uni[y]
        assert r["pmi"] == pytest.approx(
            math.log(c * n_uni * n_uni / (uni[x] * uni[y] * n_bi)),
            rel=1e-12,
        )


# ------------------------------------------------------------- EWMA


def _mk_series(spark, rows):
    return spark.createDataFrame(
        rows, "k string, day date, v long"
    )


def test_ewma_matches_python_recursion_bit_exact(spark):
    """Randomized multi-key series: the smoothed doubles equal a
    pure-Python replay of s_t = a*x_t + (1-a)*s_{t-1} EXACTLY (no
    approx) — same IEEE ops in the same order."""
    import datetime as dtm

    from diseasystore_spark.operators.stats import ewma_smooth

    rng = random.Random(47)
    rows = []
    for k in ["a", "b", "c"]:
        days = sorted(rng.sample(range(120), rng.randrange(5, 60)))
        for d in days:
            rows.append(
                (k, dtm.date(2024, 1, 1) + dtm.timedelta(days=d),
                 rng.randrange(0, 1000))
            )
    df = _mk_series(spark, rows)
    out = ewma_smooth(df, ["k"], "day", "v", alpha=0.25)
    got = {
        (r["k"], str(r["day"])): (r["v"], r["ewma"])
        for r in out.collect()
    }

    series = {}
    for k, d, v in rows:
        series.setdefault(k, []).append((d, v))
    want = {}
    for k, pts in series.items():
        s = None
        for d, v in sorted(pts):
            s = float(v) if s is None else 0.25 * float(v) + 0.75 * s
            want[(k, str(d))] = (float(v), s)
    assert got == want  # exact double equality, not approx


def test_ewma_null_rows_excluded_and_validation(spark):
    from diseasystore_spark.operators.stats import ewma_smooth

    df = spark.createDataFrame(
        [("a", "2024-01-01", 4), ("a", None, 9), ("a", "2024-01-02", None)],
        "k string, day string, v long",
    ).selectExpr("k", "CAST(day AS DATE) day", "v")
    out = ewma_smooth(df, ["k"], "day", "v").collect()
    assert len(out) == 1 and out[0]["ewma"] == 4.0

    with pytest.raises(ValueError, match="alpha"):
        ewma_smooth(df, ["k"], "day", "v", alpha=0.0)
    with pytest.raises(ValueError, match="key_cols"):
        ewma_smooth(df, [], "day", "v")


def test_ewma_duplicate_order_within_key_fails_loud(spark):
    from pyspark.errors.exceptions.captured import PythonException

    from diseasystore_spark.operators.stats import ewma_smooth

    df = spark.createDataFrame(
        [("a", "2024-01-01", 1), ("a", "2024-01-01", 2)],
        "k string, day string, v long",
    ).selectExpr("k", "CAST(day AS DATE) day", "v")
    with pytest.raises(PythonException, match="duplicate"):
        ewma_smooth(df, ["k"], "day", "v").collect()


# --------------------------------------------------- reproduction rate


def test_reproduction_rate_semantics(spark):
    """Crafted series: warm-up NULLs until every lag exists, exact
    integer lambda over the dense spine (gap days count as 0), NULL
    rt on a zero denominator."""
    from diseasystore_spark.operators.events import reproduction_rate

    rows, eid = [], 0
    # type "a": counts on days 1..8 = [1,2,3,4,5,0(gap),7,8]
    counts = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 7: 7, 8: 8}
    for d, c in counts.items():
        for _ in range(c):
            rows.append((eid, f"1996-01-0{d} 12:00:00", 1, "a", 0.0))
            eid += 1
    df = _mk_events(spark, rows)
    got = {
        str(r["day"]): r
        for r in reproduction_rate(
            df, si_weights=(1, 2, 3, 2, 1)
        ).collect()
    }
    assert len(got) == 8  # dense spine 01..08
    # warm-up: rows 1..5 (rn <= n_lags) have NULL lambda/rt
    for d in range(1, 6):
        assert got[f"1996-01-0{d}"]["lambda_num"] is None
        assert got[f"1996-01-0{d}"]["rt"] is None
    # day 6: lags (5,4,3,2,1) x weights (1,2,3,2,1) = 5+8+9+4+1 = 27
    d6 = got["1996-01-06"]
    assert d6["n_events"] == 0 and d6["lambda_num"] == 27
    assert d6["rt"] == 0.0
    # day 8: lags are days 7..3 = (7,0,5,4,3) -> 7+0+15+8+3 = 33
    d8 = got["1996-01-08"]
    assert d8["lambda_num"] == 33
    assert d8["rt"] == 8 * 9 / 33

    with pytest.raises(ValueError, match="si_weights"):
        reproduction_rate(df, si_weights=())


def test_reproduction_rate_matches_python_oracle(spark):
    import collections
    import datetime as dtm

    from diseasystore_spark.operators.events import reproduction_rate

    rng = random.Random(11)
    rows, eid = [], 0
    for _ in range(800):
        rows.append(
            (eid,
             (dtm.datetime(2024, 3, 1)
              + dtm.timedelta(days=rng.randrange(0, 25))).isoformat(sep=" "),
             1, rng.choice(["x", "y"]), 0.0)
        )
        eid += 1
    df = _mk_events(spark, rows)
    weights = (2, 5, 3)
    got = {
        (r["event_type"], str(r["day"])): (
            r["n_events"], r["lambda_num"], r["rt"])
        for r in reproduction_rate(df, si_weights=weights).collect()
    }

    counts = collections.Counter()
    for _, ts, _, t, _ in rows:
        counts[(t, ts[:10])] += 1
    days = sorted({d for _, d in counts})
    lo = dtm.date.fromisoformat(min(days))
    hi = dtm.date.fromisoformat(max(days))
    spine = [
        str(lo + dtm.timedelta(days=i))
        for i in range((hi - lo).days + 1)
    ]
    want = {}
    for t in ["x", "y"]:
        series = [counts.get((t, d), 0) for d in spine]
        for i, d in enumerate(spine):
            if i < len(weights):
                want[(t, d)] = (series[i], None, None)
                continue
            lam = sum(
                w * series[i - s]
                for s, w in enumerate(weights, start=1)
            )
            rt = (series[i] * sum(weights)) / lam if lam > 0 else None
            want[(t, d)] = (series[i], lam, rt)
    assert got == want


# ----------------------------------------- CUSUM / Benford / Gini


def test_cusum_closed_form_equals_direct_recursion(spark):
    """Randomized: the prefix-sum closed form reproduces the direct
    S_t = max(0, S_{t-1} + x_t - k) recursion exactly, flags
    included, per key and drift."""
    import datetime as dtm

    from diseasystore_spark.operators.stats import cusum_changepoints

    rng = random.Random(7)
    rows = []
    ks = {"a": 5, "b": 0, "c": 12}
    for k in ks:
        for d in range(40):
            rows.append(
                (k, dtm.date(2024, 1, 1) + dtm.timedelta(days=d),
                 rng.randrange(0, 30), ks[k])
            )
    df = spark.createDataFrame(
        rows, "k string, day date, v long, drift long"
    )
    got = {
        (r["k"], str(r["day"])): (r["cusum"], r["flagged"])
        for r in cusum_changepoints(
            df, ["k"], "day", "v", "drift", threshold_mult=3
        ).collect()
    }
    want = {}
    for key in ks:
        s = 0
        for kk, d, v, drift in sorted(
            (r for r in rows if r[0] == key), key=lambda r: r[1]
        ):
            s = max(0, s + v - drift)
            want[(key, str(d))] = (s, s > 3 * drift)
    assert got == want
    assert any(f for _, f in want.values()), "fixture should flag"

    with pytest.raises(ValueError, match="threshold_mult"):
        cusum_changepoints(df, ["k"], "day", "v", "drift", 0)


def test_benford_digits_exact_counts_and_exclusions(spark):
    """Digit comes from integer cents: 0.01 -> '1', 1234.56 ->
    '1'; zero/negative/NULL amounts excluded; shares sum to 1."""
    from diseasystore_spark.operators.stats import benford_digits

    df = spark.createDataFrame(
        [(0.01,), (1234.56,), (987.0,), (9.99,), (0.0,), (-5.0,),
         (None,), (0.004,)],
        "amt double",
    )
    rows = {r["digit"]: r for r in benford_digits(df, "amt").collect()}
    # 0.004 rounds to 0 cents -> excluded; digits: 1 (x2), 9 (x2)
    assert {d: r["n"] for d, r in rows.items()} == {1: 2, 9: 2}
    assert sum(r["p_obs"] for r in rows.values()) == pytest.approx(1.0)
    import math

    assert rows[1]["p_benford"] == pytest.approx(math.log10(2))


def test_gini_by_group_matches_python_and_known_values(spark):
    from diseasystore_spark.operators.stats import gini_by_group

    rng = random.Random(3)
    rows = [("eq", 7.00) for _ in range(10)]          # all equal -> 0
    rows += [("one", 0.01)] + [("one", 0.0)] * 5      # single holder
    rows += [("rng", round(rng.uniform(0.01, 500.0), 2))
             for _ in range(200)]
    df = spark.createDataFrame(rows, "g string, amt double")
    got = {
        r["g"]: (r["n"], r["total_c"], r["gini"])
        for r in gini_by_group(df, ["g"], "amt").collect()
    }
    assert got["eq"][2] == 0.0
    assert got["one"][0] == 1 and got["one"][2] == 0.0

    xs = sorted(
        round(a * 100) for g, a in rows if g == "rng" and a > 0
    )
    n, tot = len(xs), sum(xs)
    ix = sum((i + 1) * x for i, x in enumerate(xs))
    want = (2 * ix - (n + 1) * tot) / (n * tot)
    assert got["rng"] == (n, tot, pytest.approx(want, rel=1e-12))


def test_keyword_spans_overlaps_case_and_validation(spark):
    """Overlapping and repeated matches all emitted with 1-based
    positions on the original string; case-insensitive by default;
    case-sensitive mode distinguishes; empty/NULL terms raise."""
    import pytest

    from diseasystore_spark.pipeline.text import keyword_spans

    df = spark.createDataFrame(
        [(1, "the Cat sat on the cat mat"), (2, "no hits here"), (3, None)],
        "doc_id bigint, text string",
    )
    got = sorted(
        tuple(r) for r in keyword_spans(df, ["cat", "the cat"]).collect()
    )
    assert got == [
        (1, "cat", 5), (1, "cat", 20),
        (1, "the cat", 1), (1, "the cat", 16),
    ]
    cs = keyword_spans(df, ["cat"], case_insensitive=False).collect()
    assert [(r["doc_id"], r["pos"]) for r in cs] == [(1, 20)]

    with pytest.raises(ValueError, match="non-empty"):
        keyword_spans(df, [])
    with pytest.raises(ValueError, match="non-empty"):
        keyword_spans(df, ["ok", ""])


def test_welch_t_matches_scipy_formula(spark):
    """Hand/NumPy-checked Welch t per group; missing-arm and
    size-1-arm groups yield NULL t but keep their row."""
    import math

    from diseasystore_spark.operators.stats import welch_t_by_group

    a = [100, 110, 120, 130]   # treatment cents
    b = [90, 95, 105]          # control cents
    rows = [("g1", True, v) for v in a] + [("g1", False, v) for v in b]
    rows += [("g2", True, 50)]                 # arm sizes 1 / 0
    rows += [("g3", True, 10), ("g3", False, 20), ("g3", False, 30)]
    df = spark.createDataFrame(rows, "g string, arm boolean, cents bigint")
    out = {r["g"]: r for r in welch_t_by_group(df, ["g"], "arm", "cents").collect()}

    mt, mc = sum(a) / 4, sum(b) / 3
    vt = sum((x - mt) ** 2 for x in a) / 3
    vc = sum((x - mc) ** 2 for x in b) / 2
    want = (mt - mc) / math.sqrt(vt / 4 + vc / 3)
    assert abs(out["g1"]["t"] - want) < 1e-9
    assert out["g1"]["n_t"] == 4 and out["g1"]["n_c"] == 3
    assert out["g2"]["t"] is None and out["g2"]["mean_c"] is None
    assert out["g3"]["t"] is None  # treatment arm of size 1


def test_transition_matrix_rows_sum_to_one(spark):
    """Counts match the hand-ordered per-user sequences (ties broken
    by event_id); per-prev probabilities sum to 1; NULLs excluded."""
    import datetime as dt

    from diseasystore_spark.operators.events import transition_matrix

    T = dt.datetime
    rows = [
        (1, "a", T(2024, 1, 1, 0), 1),
        (1, "b", T(2024, 1, 1, 1), 2),
        (1, "a", T(2024, 1, 1, 2), 3),
        (2, "a", T(2024, 1, 1, 0), 4),
        (2, "a", T(2024, 1, 1, 0), 5),  # tie: event_id orders it
        (2, "c", T(2024, 1, 1, 1), 6),
        (None, "a", T(2024, 1, 1), 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp, event_id bigint"
    )
    out = {(r["prev_type"], r["next_type"]): r for r in transition_matrix(df).collect()}
    assert out[("a", "b")]["n"] == 1
    assert out[("b", "a")]["n"] == 1
    assert out[("a", "a")]["n"] == 1  # user 2's tie pair
    assert out[("a", "c")]["n"] == 1
    from collections import defaultdict

    rowsum = defaultdict(float)
    for (p, _n), r in out.items():
        rowsum[p] += r["p"]
    assert all(abs(v - 1.0) < 1e-12 for v in rowsum.values())


def test_welch_t_overflow_fails_loud(spark):
    """A decimal(38,0) overflow in an arm's Σx² must raise, never
    propagate NULL stats as if the arm were empty. Under ANSI mode
    (Spark 4 default) the multiply itself raises NUMERIC_VALUE_OUT_OF
    _RANGE; with ANSI off it NULLs silently and the operator's own
    guard (NULL sum with a positive count) fires instead — both are
    fail-loud."""
    from decimal import Decimal

    import pytest

    from diseasystore_spark.operators.stats import welch_t_by_group

    big = Decimal(10**19)  # big² = 1e38 overflows decimal(38,0)
    rows = [
        ("g", True, big),
        ("g", True, big),
        ("g", False, Decimal(1)),
        ("g", False, Decimal(2)),
    ]
    df = spark.createDataFrame(
        rows, "g string, arm boolean, cents decimal(38,0)"
    )
    with pytest.raises(Exception, match="(?i)overflow|out_of_range"):
        welch_t_by_group(df, ["g"], "arm", "cents").collect()

    # the ANSI-off path: the silent-NULL regime the guard exists for
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="overflow"):
            welch_t_by_group(df, ["g"], "arm", "cents").collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_keyword_spans_automaton_matches_codegen_5k_terms(spark):
    """The Aho-Corasick mapInPandas engine and the literal-array
    codegen engine emit the identical span set on a 5k-term
    dictionary (planted overlapping/nested phrases included), and
    engine='auto' routes a dictionary that size to the automaton."""
    import random as _random

    from diseasystore_spark.pipeline.text import (
        KEYWORD_AUTOMATON_MIN_TERMS,
        keyword_spans,
    )

    rng = _random.Random(17)
    vocab = [f"w{i}" for i in range(80)] + ["cat", "catalog", "log", "dog"]
    terms = {f"{rng.choice(vocab)} {rng.choice(vocab)}" for _ in range(20000)}
    terms = sorted(terms)[:5000] + ["cat", "catalog", "log"]
    assert len(terms) >= 5000 > KEYWORD_AUTOMATON_MIN_TERMS

    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(40)))
        for i in range(60)
    ]
    rows.append((999, "the catalog of dog log"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    auto = keyword_spans(df, terms)  # routes to automaton at 5k terms
    assert "MapInPandas" in auto._jdf.queryExecution().executedPlan().toString()
    got_auto = set(map(tuple, auto.collect()))
    got_cg = set(
        map(tuple, keyword_spans(df, terms, engine="codegen").collect())
    )
    assert got_auto == got_cg
    # nested phrases all reported from the planted doc
    planted = {(t, p) for d, t, p in got_auto if d == 999}
    assert {("cat", 5), ("catalog", 5), ("log", 9), ("log", 20)} <= planted


def test_keyword_spans_10k_terms_no_plan_blowup(spark):
    """A 10k-term dictionary must not embed the terms in the SQL plan
    (literal arrays at that size blow up plan size and codegen): the
    auto-routed automaton plan stays dictionary-free and answers
    correctly."""
    from diseasystore_spark.pipeline.text import keyword_spans

    terms = [f"term{i:05d}" for i in range(10_000)] + ["needle phrase"]
    df = spark.createDataFrame(
        [(1, "a needle phrase and term00042 here"), (2, "nothing")],
        "doc_id bigint, text string",
    )
    out = keyword_spans(df, terms)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "term09999" not in plan  # dictionary rides the closure
    assert len(plan) < 20_000
    got = set(map(tuple, out.collect()))
    assert got == {(1, "needle phrase", 3), (1, "term00042", 21)}

    import pytest

    with pytest.raises(ValueError, match="engine"):
        keyword_spans(df, terms, engine="nope")


def test_spearman_rho_matches_python_oracle(spark):
    """Tie-aware Spearman against a Python average-rank Pearson
    oracle on a tied, noisy monotone relation; constant column yields
    NULL; anti-monotone data yields -1."""
    import math
    import random as _random

    from diseasystore_spark.operators.stats import spearman_rho

    rng = _random.Random(31)
    rows = [(rng.random(), 0.0) for _ in range(400)]
    rows = [(a, min(0.999, a + 0.25 * rng.random())) for a, _ in rows]
    rows += [(0.5, 0.5)] * 25  # tie block in both columns
    df = spark.createDataFrame(rows, "a double, b double")
    r = spearman_rho(df, "a", "b").collect()[0]

    def avg_ranks(vals):
        q = [math.floor(v * 1_000_000) for v in vals]
        order = sorted(q)
        first = {}
        for i, v in enumerate(order):
            first.setdefault(v, i + 1)
        from collections import Counter

        cnt = Counter(q)
        return [first[v] + (cnt[v] - 1) / 2 for v in q]

    ra = avg_ranks([a for a, _ in rows])
    rb = avg_ranks([b for _, b in rows])
    n = len(rows)
    ma, mb = sum(ra) / n, sum(rb) / n
    cov = sum((x - ma) * (y - mb) for x, y in zip(ra, rb))
    va = sum((x - ma) ** 2 for x in ra)
    vb = sum((y - mb) ** 2 for y in rb)
    want = cov / math.sqrt(va * vb)
    assert r["n"] == n
    assert abs(r["rho"] - want) < 1e-9

    const = spark.createDataFrame(
        [(0.5, 0.1), (0.5, 0.9)], "a double, b double"
    )
    assert spearman_rho(const, "a", "b").collect()[0]["rho"] is None
    anti = spark.createDataFrame(
        [(0.1, 0.9), (0.5, 0.5), (0.9, 0.1)], "a double, b double"
    )
    assert spearman_rho(anti, "a", "b").collect()[0]["rho"] == -1.0


def test_group_quantile_normalize_matches_python(spark):
    """Mid-rank percentiles per group against a Python oracle
    (tie-aware); monotone within group; validation raises."""
    import math
    import random as _random
    from collections import Counter

    import pytest

    from diseasystore_spark.operators.stats import group_quantile_normalize

    rng = _random.Random(13)
    rows = [
        (i, f"s{i % 3}", round(rng.random(), 2))  # coarse -> many ties
        for i in range(300)
    ]
    # NULL group key is a legitimate stratum: rows must rank within
    # it, not silently vanish (round-7 advice regression)
    rows += [(300 + i, None, round(rng.random(), 2)) for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score double")
    got = {
        r["doc_id"]: r["pct_micro"]
        for r in group_quantile_normalize(df, "score", ["grp"]).collect()
    }
    by_grp = {}
    for i, g, s in rows:
        by_grp.setdefault(g, []).append((i, math.floor(s * 1_000_000)))
    for g, members in by_grp.items():
        qs = [q for _, q in members]
        cnt = Counter(qs)
        n = len(qs)
        for i, q in members:
            less = sum(c for v, c in cnt.items() if v < q)
            want = (2 * less + cnt[q]) * 1_000_000 // (2 * n)
            assert got[i] == want
    with pytest.raises(ValueError, match="group_cols"):
        group_quantile_normalize(df, "score", [])


def test_chi_square_independence_matches_python(spark):
    """chi2/dof/Cramér's V against a Python contingency oracle,
    including a zero-observed cell contributing its expected mass;
    independent columns score near zero."""
    import math
    from collections import Counter

    import pytest

    from diseasystore_spark.operators.stats import chi_square_independence

    rows = (
        [("en", "web")] * 40 + [("en", "book")] * 10
        + [("de", "web")] * 5 + [("de", "book")] * 45
        + [("fr", "web")] * 20  # (fr, book) is a ZERO cell
    )
    df = spark.createDataFrame(rows, "lang string, src string")
    r = chi_square_independence(df, "lang", "src").collect()[0]

    cells = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    micro = 0
    for a in ra:
        for b in cb:
            e = ra[a] * cb[b] / n
            o = float(cells.get((a, b), 0))
            micro += math.floor((o - e) * (o - e) / e * 1_000_000)
    assert r["n"] == n and (r["r"], r["c"]) == (3, 2) and r["dof"] == 2
    assert r["chi2_micro"] == micro
    assert r["cramers_v"] == pytest.approx(
        math.sqrt((micro / 1e6) / (n * 1)), rel=1e-12
    )

    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv" for _ in range(25)],
        "lang string, src string",
    )
    assert chi_square_independence(indep, "lang", "src").collect()[0][
        "chi2"
    ] == pytest.approx(0.0)


def test_permutation_test_detects_effect_and_is_partition_invariant(spark):
    """A planted arm effect gets the minimum attainable p; a null
    group does not; the md5-derived draws make the result invariant
    to partitioning; duplicates draw independent bits (p not stuck
    at minimum for a null group of identical rows)."""
    import random as _random

    from diseasystore_spark.operators.stats import permutation_test_by_group

    rng = _random.Random(3)
    rows = []
    for _ in range(400):
        arm = rng.random() < 0.5
        rows.append(("sig", arm, 1000 + (500 if arm else 0) + rng.randint(-100, 100)))
        rows.append(("null", arm, 1000 + rng.randint(-100, 100)))
    # an all-duplicate null group: every row identical except arm
    rows += [("dups", i % 2 == 0, 777) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, arm boolean, cents bigint")
    got = {
        r["g"]: r
        for r in permutation_test_by_group(df, ["g"], "arm", "cents").collect()
    }
    assert got["sig"]["p_micro"] == 1_000_000 // 64  # min attainable
    assert got["null"]["p_micro"] > 100_000
    assert got["dups"]["t_obs"] == 0  # constant metric: no effect
    got2 = {
        r["g"]: r
        for r in permutation_test_by_group(
            df.repartition(13), ["g"], "arm", "cents"
        ).collect()
    }
    assert {k: v["p_micro"] for k, v in got.items()} == {
        k: v["p_micro"] for k, v in got2.items()
    }
    assert {k: v["n_ge"] for k, v in got.items()} == {
        k: v["n_ge"] for k, v in got2.items()
    }


def test_permutation_test_no_int64_wrap(spark):
    """T = |n·Σ(x·a) − (Σa)·Σx| on near-int64-max cents: bigint
    arithmetic would wrap silently (ANSI off); the decimal(38,0)
    path must produce the exact Python-integer value (round-7
    advice regression — the welch/roc_auc/ks hardening applied to
    the one operator left behind)."""
    from diseasystore_spark.operators.stats import permutation_test_by_group

    # n=40, cents ~ 2e17: the SUMS fit int64 (Σx ~ 8e18 < 9.2e18 —
    # the documented linear envelope) but the cross-products do not
    # (n·Σxa ~ 1.6e20), so this pins exactly the decimal(38,0) path
    rows = [
        ("g", i % 2 == 0, 200_000_000_000_000_000 + i * 1_000_003)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, arm boolean, cents bigint")
    got = permutation_test_by_group(df, ["g"], "arm", "cents").collect()[0]
    n = len(rows)
    sx = sum(c for _, _, c in rows)
    na = sum(1 for _, a, _ in rows if a)
    sxa = sum(c for _, a, c in rows if a)
    want = abs(n * sxa - na * sx)
    # the test only bites if the int64 CROSS-PRODUCTS would wrap
    # (the difference itself nearly cancels and fits the bigint
    # output contract)
    assert n * sxa > 2**63 and na * sx > 2**63
    assert want < 2**63
    assert got["t_obs"] == want


def test_bh_fdr_step_up_rule(spark):
    """The textbook BH example: a p that fails its own threshold is
    still significant when a LARGER rank passes (step-up); ranks are
    deterministic under ties via tiebreak_cols; validation raises."""
    import pytest

    from diseasystore_spark.pipeline.validate import bh_fdr

    # m=5, alpha=0.25: thresholds 0.05/0.10/0.15/0.20/0.25
    # p = [0.01, 0.12, 0.14, 0.30, 0.90]: rank2 (0.12) FAILS 0.10 but
    # rank3 (0.14 <= 0.15) passes -> k=3 -> ranks 1..3 significant.
    ps = [(1, 10000), (2, 120000), (3, 140000), (4, 300000), (5, 900000)]
    # NULL-p hypothesis: rows through unranked/insignificant and does
    # NOT count toward m (round-7 advice: no silent vanishing)
    ps.append((6, None))
    df = spark.createDataFrame(ps, "test int, p_micro bigint")
    got = {
        r["test"]: r
        for r in bh_fdr(
            df, "p_micro", alpha_micro=250_000, tiebreak_cols=["test"]
        ).collect()
    }
    assert len(got) == 6
    assert [got[t]["significant"] for t in [1, 2, 3, 4, 5]] == [
        True, True, True, False, False,
    ]
    assert [got[t]["p_rank"] for t in [1, 2, 3, 4, 5]] == [1, 2, 3, 4, 5]
    assert got[6]["p_rank"] is None and got[6]["significant"] is False

    # all-insignificant frame: no NULL k explosion
    none = spark.createDataFrame(
        [(1, 900000), (2, 950000)], "test int, p_micro bigint"
    )
    out = bh_fdr(none, "p_micro", alpha_micro=50_000).collect()
    assert all(not r["significant"] for r in out)

    with pytest.raises(ValueError, match="alpha_micro"):
        bh_fdr(df, "p_micro", alpha_micro=0)
