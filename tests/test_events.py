"""Funnel / retention / kNN-classify semantics and plan shape.

The funnel state machine's tricky cases are all here: out-of-order
stages stall, same-instant events don't chain (strict >), a later
re-occurrence after the stall point does chain, and the whole plan
shuffles exactly once on the user key.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from diseasystore_spark.operators.events import (
    funnel_counts,
    funnel_reach,
    retention_cohorts,
)

T = dt.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string"
    )


def _reach_map(spark, rows, stages):
    df = funnel_reach(_events(spark, rows), stages)
    return {r["user_id"]: r["reach"] for r in df.collect()}


def test_funnel_happy_path_and_stall(spark):
    rows = [
        (1, T(2024, 1, 1, 0, 0), "view"),
        (1, T(2024, 1, 1, 0, 1), "click"),
        (1, T(2024, 1, 1, 0, 2), "purchase"),
        # click BEFORE first view: must not count; user stalls at view
        (2, T(2024, 1, 1, 0, 1), "click"),
        (2, T(2024, 1, 1, 0, 2), "view"),
    ]
    m = _reach_map(spark, rows, ["view", "click", "purchase"])
    assert all(v is not None for v in m[1])
    assert m[2][0] is not None and m[2][1] is None and m[2][2] is None


def test_funnel_same_instant_does_not_chain(spark):
    rows = [
        (3, T(2024, 1, 1), "view"),
        (3, T(2024, 1, 1), "click"),  # simultaneous: strict > blocks
        (4, T(2024, 1, 1), "view"),
        (4, T(2024, 1, 1, 0, 0, 0, 1), "click"),  # 1 microsecond later
    ]
    m = _reach_map(spark, rows, ["view", "click"])
    assert m[3][1] is None
    assert m[4][1] is not None


def test_funnel_reoccurrence_after_stall_chains(spark):
    # click at t1 (before view) ignored; second click at t3 counts.
    rows = [
        (5, T(2024, 1, 1, 0, 1), "click"),
        (5, T(2024, 1, 1, 0, 2), "view"),
        (5, T(2024, 1, 1, 0, 3), "click"),
    ]
    m = _reach_map(spark, rows, ["view", "click"])
    assert m[5][1] == int(T(2024, 1, 1, 0, 3).timestamp() * 1_000_000)


def test_funnel_counts_monotone_and_complete(spark):
    rows = [
        (1, T(2024, 1, 1, 0, 0), "view"),
        (1, T(2024, 1, 1, 0, 1), "click"),
        (2, T(2024, 1, 1, 0, 0), "view"),
        (6, T(2024, 1, 1, 0, 0), "error"),  # not a funnel stage
    ]
    out = funnel_counts(_events(spark, rows), ["view", "click", "purchase"])
    got = {r["stage"]: r["users"] for r in out.collect()}
    assert got == {"view": 2, "click": 1, "purchase": 0}


def test_funnel_rejects_bad_stages(spark):
    df = _events(spark, [(1, T(2024, 1, 1), "view")])
    with pytest.raises(ValueError, match="non-empty"):
        funnel_reach(df, [])
    with pytest.raises(ValueError, match="distinct"):
        funnel_reach(df, ["view", "view"])


def test_funnel_single_shuffle(spark):
    """The event-data path must shuffle exactly once (groupBy user);
    the K-stage logic is one aggregate expression, not K joins."""
    df = _events(spark, [(1, T(2024, 1, 1), "view")])
    plan = (
        funnel_reach(df, ["view", "click", "purchase"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Aggregate") <= 2  # partial + final of ONE groupBy
    assert "Join" not in plan


def test_retention_offsets(spark):
    rows = [
        # cohort Mon 2024-01-01; active again in week +2
        (1, T(2024, 1, 2), "view"),
        (1, T(2024, 1, 16), "click"),
        # cohort week of 2024-01-08; same-week second event dedups
        (2, T(2024, 1, 8), "view"),
        (2, T(2024, 1, 9), "view"),
    ]
    out = retention_cohorts(_events(spark, rows), period="week")
    got = {
        (str(r["cohort"]), r["period_offset"]): r["active_users"]
        for r in out.collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_retention_rejects_bad_period(spark):
    with pytest.raises(ValueError, match="period"):
        retention_cohorts(_events(spark, [(1, T(2024, 1, 1), "x")]), period="quarter")


def test_knn_classify_majority_and_tiebreak(spark):
    from diseasystore_spark.pipeline.similarity import knn_classify

    # Query 0 at origin-ish; labels of its 3 nearest: 1, 1, 2 -> 1.
    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 9),
            (1, [0.99, 0.1], 1),
            (2, [0.98, 0.2], 1),
            (3, [0.97, 0.3], 2),
            (4, [-1.0, 0.0], 2),
        ],
        "vec_id int, embedding array<float>, label int",
    )
    out = knn_classify(
        corpus, corpus.where(F.col("vec_id") == 0), k=3
    ).collect()
    assert len(out) == 1
    assert out[0]["pred_label"] == 1 and out[0]["votes"] == 2

    # k=2: one vote each for labels 1 and 1 -> still 1; k=4 adds
    # label-2 vote -> 2-2 tie broken to the smaller label (1).
    tie = knn_classify(
        corpus, corpus.where(F.col("vec_id") == 0), k=4
    ).collect()
    assert tie[0]["pred_label"] == 1 and tie[0]["votes"] == 2


# ---------------------------------------------------------------------------
# Property-based: funnel state machine vs a brute-force Python oracle
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

STAGES = ["s0", "s1", "s2"]


def py_funnel(events):
    """Obviously-correct oracle: tj = min ts of stage j with
    ts STRICTLY greater than t(j-1), computed by literal scan."""
    reach = []
    prev = None
    for j, s in enumerate(STAGES):
        cand = [
            ts for (ts, typ) in events
            if typ == s and (j == 0 or (prev is not None and ts > prev))
        ]
        cur = min(cand) if cand else None
        reach.append(cur)
        prev = cur
    return reach


ev_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # coarse ts: force ties
        st.sampled_from(STAGES + ["noise"]),
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=25, deadline=None)
@given(st.lists(ev_strategy, min_size=1, max_size=4))
def test_funnel_matches_python_oracle(spark, user_events):
    import datetime as dt

    rows = []
    expected = {}
    for uid, evs in enumerate(user_events):
        for ts, typ in evs:
            rows.append((uid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts), typ))
        if any(t in STAGES for _, t in evs):
            expected[uid] = py_funnel(evs)
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string"
    )
    got = {
        r["user_id"]: r["reach"]
        for r in funnel_reach(df, STAGES).collect()
    }
    base = int(dt.datetime(2024, 1, 1).timestamp() * 1_000_000)
    want = {
        uid: [None if t is None else base + t * 1_000_000 for t in reach]
        for uid, reach in expected.items()
    }
    assert got == want


def test_funnel_and_retention_ignore_null_ts(spark):
    rows = [
        (1, T(2024, 1, 1), "view"),
        (1, None, "click"),  # NULL ts: ignored, cannot chain
    ]
    df = _events(spark, rows)
    m = _reach_map(spark, rows, ["view", "click"])
    assert m[1][0] is not None and m[1][1] is None
    out = retention_cohorts(df).collect()
    assert {(str(r["cohort"]), r["period_offset"]) for r in out} == {
        ("2024-01-01", 0)
    }


@settings(max_examples=15, deadline=None)
@given(st.lists(ev_strategy, min_size=1, max_size=3))
def test_funnel_joins_variant_matches_array_form(spark, user_events):
    import datetime as dt

    from diseasystore_spark.operators.events import funnel_reach_joins

    rows = [
        (uid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts), typ)
        for uid, evs in enumerate(user_events)
        for ts, typ in evs
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string"
    )
    a = {r["user_id"]: r["reach"]
         for r in funnel_reach(df, STAGES).collect()}
    b = {r["user_id"]: r["reach"]
         for r in funnel_reach_joins(df, STAGES).collect()}
    assert a == b


@settings(max_examples=15, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),     # user
              st.integers(min_value=0, max_value=40)),   # day offset
    min_size=1, max_size=25,
))
def test_retention_matches_python_oracle(spark, events):
    import datetime as dt

    rows = [
        (u, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), "e")
        for u, d in events
    ]
    df = _events(spark, rows)
    got = {
        (str(r["cohort"]), r["period_offset"]): r["active_users"]
        for r in retention_cohorts(df, period="week").collect()
    }
    # Python oracle: ISO-Monday week bucketing.
    def wk(d):
        day = (dt.date(2024, 1, 1) + dt.timedelta(days=d))
        return day - dt.timedelta(days=day.weekday())
    first = {}
    for u, d in events:
        first[u] = min(first.get(u, wk(d)), wk(d))
    want: dict[tuple, set] = {}
    for u, d in events:
        off = (wk(d) - first[u]).days // 7
        want.setdefault((str(first[u]), off), set()).add(u)
    assert got == {k: len(v) for k, v in want.items()}


def test_user_journeys_tie_order_deterministic(spark):
    from diseasystore_spark.operators.events import user_journeys

    # same ts, distinct event_ids: order must follow event_id
    rows = [
        (1, T(2024, 1, 1), "b", 2),
        (1, T(2024, 1, 1), "a", 1),
        (1, T(2024, 1, 1, 0, 1), "c", 3),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string, event_id long"
    )
    out = user_journeys(df).collect()
    assert out[0]["journey"] == "a b c"


def test_funnel_epoch_micros_minus_one_not_sentinel(spark):
    """Regression: an event at 1969-12-31T23:59:59.999999 has
    unix_micros == -1, which collided with the old 'not reached'
    sentinel (slot mapped to NULL and stayed overwritable). The
    sentinel is now Long.MIN_VALUE, unreachable by any timestamp."""
    t0 = T(1969, 12, 31, 23, 59, 59, 999999)   # unix_micros == -1
    rows = [
        (1, t0, "view"),
        (1, T(1970, 1, 1, 0, 0, 1), "click"),
    ]
    m = _reach_map(spark, rows, ["view", "click"])
    assert m[1][0] == -1           # the real epoch value, not NULL
    assert m[1][1] is not None     # chained: slot 0 was NOT overwritable

    counts = {
        r["stage"]: r["users"]
        for r in funnel_counts(
            _events(spark, rows), ["view", "click"]
        ).collect()
    }
    assert counts == {"view": 1, "click": 1}


def test_funnel_counts_quoted_stage_names(spark):
    """Stage names containing quotes/backslashes must flow through as
    data (typed unpivot), never into a SQL string."""
    rows = [
        (1, T(2024, 1, 1), "o'brien \\ stage"),
        (1, T(2024, 1, 2), 'say "go"'),
    ]
    counts = {
        r["stage"]: r["users"]
        for r in funnel_counts(
            _events(spark, rows), ["o'brien \\ stage", 'say "go"']
        ).collect()
    }
    assert counts == {"o'brien \\ stage": 1, 'say "go"': 1}


def test_anomaly_days_integer_exact_semantics(spark):
    """Flag semantics on constructed series: spikes flag, the
    mean-equal day doesn't, and a zero-variance trailing window flags
    ANY deviation (dev² > 0) but not equality (0 > 0 is false)."""
    import datetime as dtm

    from diseasystore_spark.operators.events import anomaly_days

    rows = []
    eid = 0
    # type "a": constant 5/day for 7 days, then a day of 5 (equal,
    # not flagged), then a day of 6 (flagged: zero-variance window)
    day0 = dtm.datetime(2024, 1, 1)
    counts_a = [5] * 7 + [5, 6]
    for d, c in enumerate(counts_a):
        for _ in range(c):
            eid += 1
            rows.append((eid, day0 + dtm.timedelta(days=d), 1, "a"))
    # type "b": noisy baseline then a 100x spike
    counts_b = [4, 6, 5, 7, 5, 6, 4, 500]
    for d, c in enumerate(counts_b):
        for _ in range(c):
            eid += 1
            rows.append((eid, day0 + dtm.timedelta(days=d), 1, "b"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id int, event_type string"
    )
    got = {
        (r["event_type"], str(r["day"])): r["flagged"]
        for r in anomaly_days(ev, trailing=7, z=3).collect()
    }
    assert got == {
        ("a", "2024-01-08"): False,   # equals the mean
        ("a", "2024-01-09"): True,    # zero-variance window, +1 dev
        ("b", "2024-01-08"): True,    # 100x spike
    }

    # python cross-check of the integer inequality on the spike row
    S = sum(counts_b[:7]); Q = sum(c * c for c in counts_b[:7])
    assert (500 * 7 - S) ** 2 > 9 * (Q * 7 - S * S)


def test_anomaly_days_random_series_match_python(spark):
    """Randomized: anomaly flags over arbitrary event streams equal a
    pure-Python recomputation of the integer z-test on the observed
    per-(type, day) count series."""
    import collections
    import random

    from diseasystore_spark.operators.events import anomaly_days

    rng = random.Random(31)
    rows, eid = [], 0
    for _ in range(1200):
        typ = rng.choice(["a", "b", "c"])
        day = rng.randrange(0, 20)
        eid += 1
        rows.append((eid, T(2024, 1, 1 + day), 1, typ))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id int, event_type string"
    )
    k, z = 5, 2
    got = {
        (r["event_type"], str(r["day"])): (
            r["n_events"], r["trail_sum"], r["trail_sumsq"], r["flagged"]
        )
        for r in anomaly_days(ev, trailing=k, z=z).collect()
    }

    counts = collections.Counter((t, ts.date()) for _, ts, _, t in rows)
    series = collections.defaultdict(list)
    for (t, d), c in sorted(counts.items(), key=lambda kv: kv[0]):
        series[t].append((d, c))
    want = {}
    for t, days in series.items():
        for i in range(k, len(days)):
            d, n = days[i]
            window = [c for _, c in days[i - k:i]]
            S, Q = sum(window), sum(c * c for c in window)
            flag = (n * k - S) ** 2 > z * z * (Q * k - S * S)
            want[(t, str(d))] = (n, S, Q, flag)
    assert got == want
    assert any(v[3] for v in want.values()), "fixture should flag something"


def test_attribution_pairs_match_python_brute_force(spark):
    """Randomized: the interval-attribution join equals a brute-force
    Python double loop over (impression, conversion) pairs."""
    import random

    from diseasystore_spark.streaming.joins import attribute_conversions

    rng = random.Random(13)
    imps, convs = [], []
    base = T(2024, 3, 1)
    for i in range(120):
        u = rng.randrange(12)
        t = base + dt.timedelta(minutes=rng.randrange(0, 600))
        (imps if i % 2 else convs).append((u, t))
    schema = "user_id long, ts timestamp"
    W = 1800
    got = {
        (r["user_id"], r["imp_ts"], r["conv_ts"], r["lag_us"])
        for r in attribute_conversions(
            spark.createDataFrame(imps, schema),
            spark.createDataFrame(convs, schema),
            window_seconds=W,
        ).collect()
    }
    want = set()
    for u, it in imps:
        for v, ct in convs:
            if u == v and it < ct <= it + dt.timedelta(seconds=W):
                want.add((u, it, ct, int((ct - it).total_seconds() * 1e6)))
    assert got == want
    assert want, "fixture should attribute something"


def test_contact_pairs_boundaries_and_dedup(spark):
    from diseasystore_spark.operators.events import contact_pairs

    rows = [
        # (event_id, ts, user_id): u1/u2 exactly AT tolerance (in),
        # u1/u3 one second past (out), u2/u3 across a bucket boundary
        # (in), u4 self-contact only (excluded), u5/u6 equal ts (in,
        # counted once).
        (1, "1996-01-01 00:00:00", 1),
        (2, "1996-01-01 01:00:00", 2),   # u1+3600s -> in
        (3, "1996-01-01 02:00:01", 3),   # u2+3601s -> OUT (past tol)
        (4, "1996-01-01 01:59:59", 3),   # u2+3599s -> in, crosses bucket
        (5, "1996-03-01 00:00:00", 4),
        (6, "1996-03-01 00:30:00", 4),   # same user: excluded
        (7, "1996-06-01 12:00:00", 5),
        (8, "1996-06-01 12:00:00", 6),   # tie ts: exactly one count
    ]
    df = spark.createDataFrame(
        [(i, ts, u, "e", 0.0) for i, ts, u in rows],
        ["event_id", "ts", "user_id", "event_type", "value"],
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id",
        "event_type", "value",
    )
    got = {
        (r["user_a"], r["user_b"]): r["n_contacts"]
        for r in contact_pairs(df, tolerance_s=3600).collect()
    }
    assert got == {(1, 2): 1, (2, 3): 1, (5, 6): 1}


def test_contact_pairs_matches_python_oracle(spark):
    import random as _random

    from diseasystore_spark.operators.events import contact_pairs

    rng = _random.Random(5)
    rows = []
    for eid in range(400):
        # seconds offset within a 6-hour span; tolerance 600 s
        rows.append((eid, rng.randint(0, 6 * 3600), rng.randint(1, 12)))
    df = spark.createDataFrame(
        [
            (eid, f"1996-01-01 00:00:00", u, "e", float(s))
            for eid, s, u in rows
        ],
        ["event_id", "ts0", "user_id", "event_type", "value"],
    ).selectExpr(
        "event_id",
        "CAST(ts0 AS TIMESTAMP) + make_interval(0,0,0,0,0,0,value) AS ts",
        "user_id", "event_type", "value",
    )
    got = {
        (r["user_a"], r["user_b"]): r["n_contacts"]
        for r in contact_pairs(df, tolerance_s=600).collect()
    }
    from collections import Counter

    expect = Counter()
    for i, (ia, sa, ua) in enumerate(rows):
        for ib, sb, ub in rows:
            if ua == ub:
                continue
            if not (sb >= sa and sb - sa <= 600):
                continue
            if not (sa < sb or ia < ib):
                continue
            expect[(min(ua, ub), max(ua, ub))] += 1
    assert got == dict(expect)


def test_k_anonymity_violations(spark):
    from pyspark.sql import functions as F

    from diseasystore_spark.pipeline.pii import k_anonymity_violations

    df = spark.createDataFrame(
        [
            ("a", 1), ("a", 1), ("a", 1),   # group of 3: safe at k=3
            ("b", 1), ("b", 1),             # group of 2: violates
            ("c", None),                    # NULL group of 1: violates
        ],
        ["seg", "reg"],
    )
    got = {
        (r["seg"], r["reg"]): r["n"]
        for r in k_anonymity_violations(df, ["seg", "reg"], k=3).collect()
    }
    assert got == {("b", 1): 2, ("c", None): 1}
    # aliased expression quasi-identifier
    out = k_anonymity_violations(
        df, [F.col("seg").alias("s")], k=3
    ).collect()
    assert {(r["s"], r["n"]) for r in out} == {("b", 2), ("c", 1)}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        k_anonymity_violations(df, ["seg"], k=1)


def test_contact_pairs_bounded_modes_match_naive(spark):
    """min_contacts and top_k_per_user over a random stream match the
    Python naive oracle with HAVING / per-user-union-top-k applied
    after the fact — proving the degree-upper-bound prune loses no
    qualifying pair and the rank tie-break is deterministic."""
    import random as _random
    from collections import Counter, defaultdict

    from diseasystore_spark.operators.events import contact_pairs

    rng = _random.Random(11)
    rows = [
        (eid, rng.randint(0, 6 * 3600), rng.randint(1, 15))
        for eid in range(400)
    ]
    df = spark.createDataFrame(
        [(eid, "1996-01-01 00:00:00", u, "e", float(s)) for eid, s, u in rows],
        ["event_id", "ts0", "user_id", "event_type", "value"],
    ).selectExpr(
        "event_id",
        "CAST(ts0 AS TIMESTAMP) + make_interval(0,0,0,0,0,0,value) AS ts",
        "user_id", "event_type", "value",
    )
    expect = Counter()
    for i, (ia, sa, ua) in enumerate(rows):
        for ib, sb, ub in rows:
            if ua == ub or not (sb >= sa and sb - sa <= 600):
                continue
            if not (sa < sb or ia < ib):
                continue
            expect[(min(ua, ub), max(ua, ub))] += 1

    m = 4
    got_min = {
        (r["user_a"], r["user_b"]): r["n_contacts"]
        for r in contact_pairs(df, tolerance_s=600, min_contacts=m).collect()
    }
    assert got_min == {k: n for k, n in expect.items() if n >= m}

    k = 2
    ranked = defaultdict(list)  # u -> [(n desc, partner asc)]
    for (a, b), n in expect.items():
        ranked[a].append((-n, b, (a, b)))
        ranked[b].append((-n, a, (a, b)))
    keep = set()
    for u, lst in ranked.items():
        for _, _, pair in sorted(lst)[:k]:
            keep.add(pair)
    got_topk = {
        (r["user_a"], r["user_b"]): r["n_contacts"]
        for r in contact_pairs(
            df, tolerance_s=600, top_k_per_user=k
        ).collect()
    }
    assert got_topk == {p: expect[p] for p in keep}

    # sample_rate: the md5 pair predicate keeps a deterministic
    # subset; each kept pair carries its EXACT count (never a
    # partial); the draw is content-derived so it is partition- and
    # run-invariant; p=1.0 is the identity
    import hashlib

    p = 0.3
    thr = round(p * 2**32)

    def h(u):
        return int(hashlib.md5(f"cp0\x1f{u}".encode()).hexdigest()[:8], 16)

    def kept(a, b):
        return (h(a) ^ h(b)) < thr

    got_s = {
        (r["user_a"], r["user_b"]): r["n_contacts"]
        for r in contact_pairs(df, tolerance_s=600, sample_rate=p).collect()
    }
    assert got_s == {kk: n for kk, n in expect.items() if kept(*kk)}
    assert 0 < len(got_s) < len(expect)
    got_s2 = {
        (r["user_a"], r["user_b"]): r["n_contacts"]
        for r in contact_pairs(
            df.repartition(7), tolerance_s=600, sample_rate=p
        ).collect()
    }
    assert got_s2 == got_s
    got_all = {
        (r["user_a"], r["user_b"]): r["n_contacts"]
        for r in contact_pairs(df, tolerance_s=600, sample_rate=1.0).collect()
    }
    assert got_all == dict(expect)
    # composes with the threshold: sampled-then-thresholded
    got_sm = {
        (r["user_a"], r["user_b"]): r["n_contacts"]
        for r in contact_pairs(
            df, tolerance_s=600, sample_rate=p, min_contacts=m
        ).collect()
    }
    assert got_sm == {kk: n for kk, n in got_s.items() if n >= m}

    import pytest

    with pytest.raises(ValueError, match="sample_rate"):
        contact_pairs(df, sample_rate=0.0)


def test_contact_pairs_degree_prune_keeps_boundary_pairs(spark):
    """Hand case: a chatty pair clears the threshold, a loner is
    pruned by the degree bound, and a pair whose BOUND clears the
    threshold but whose true count does not is filtered by the
    post-aggregation threshold (bound is an upper bound, not exact).
    Validation raises on nonsensical parameters."""
    import pytest

    from diseasystore_spark.operators.events import contact_pairs

    base = "1996-01-01 00:00:00"
    rows = []
    eid = 0
    # users 1,2: 4 interleaved events each within one hour -> 16 pairs
    for m in range(4):
        rows.append((eid := eid + 1, 1, m * 60))
        rows.append((eid := eid + 1, 2, m * 60 + 30))
    # user 9: one event far away (degree bound 1 < threshold)
    rows.append((eid := eid + 1, 9, 9 * 24 * 3600))
    df = spark.createDataFrame(
        [(i, base, u, "e", float(s)) for i, u, s in rows],
        ["event_id", "ts0", "user_id", "event_type", "value"],
    ).selectExpr(
        "event_id",
        "CAST(ts0 AS TIMESTAMP) + make_interval(0,0,0,0,0,0,value) AS ts",
        "user_id", "event_type", "value",
    )
    got = {
        (r["user_a"], r["user_b"]): r["n_contacts"]
        for r in contact_pairs(df, tolerance_s=3600, min_contacts=10).collect()
    }
    assert got == {(1, 2): 16}

    with pytest.raises(ValueError, match="min_contacts"):
        contact_pairs(df, min_contacts=0)
    with pytest.raises(ValueError, match="top_k_per_user"):
        contact_pairs(df, top_k_per_user=0)


def _mk_events(spark, rows):
    """rows: (event_id, user_id, offset_s) -> events frame."""
    base = "1996-01-01 00:00:00"
    return spark.createDataFrame(
        [(i, base, u, "e", float(s)) for i, u, s in rows],
        ["event_id", "ts0", "user_id", "event_type", "value"],
    ).selectExpr(
        "event_id",
        "CAST(ts0 AS TIMESTAMP) + make_interval(0,0,0,0,0,0,value) AS ts",
        "user_id", "event_type", "value",
    )


def test_estimate_contact_candidates_exact_formula(spark):
    """est = sum_b n_b * (n_b + n_{b+1}) with non-adjacent buckets
    contributing no cross term: buckets [2, 3, gap, 1] at 1h
    tolerance -> 2*(2+3) + 3*3 + 1*1 = 20."""
    from diseasystore_spark.operators.events import (
        estimate_contact_candidates,
    )

    rows = (
        [(1, 1, 0), (2, 2, 10)]                       # bucket 0: 2
        + [(3, 1, 3600), (4, 2, 3610), (5, 3, 3620)]  # bucket 1: 3
        + [(6, 4, 4 * 3600)]                          # bucket 4: 1
    )
    df = _mk_events(spark, rows)
    assert estimate_contact_candidates(df, tolerance_s=3600) == 20


def test_contact_pairs_density_guard_fails_closed_and_lazy(
    spark, monkeypatch
):
    """VERDICT r9 item 1 + ADVICE r9: a BLIND dense exact call cannot
    silently run the quadratic plan — under the DEFAULT guard the job
    raises at the first action — yet construction stays lazy (zero
    Spark jobs: the candidate estimate rides inside the plan as a
    broadcast 1-row subtree, it is not an eager driver probe)."""
    import warnings as w

    from diseasystore_spark.operators import events as ev

    # 30 events in one bucket: est = 900 > patched threshold 100
    df = _mk_events(spark, [(i, i, i) for i in range(30)])
    monkeypatch.setattr(ev, "DENSE_CONTACT_CANDIDATES", 100)

    # default guard: job-free construction ...
    jobs = spark.sparkContext._jsc.sc().dagScheduler()
    before = jobs.numTotalJobs()
    out = ev.contact_pairs(df, tolerance_s=3600)
    assert jobs.numTotalJobs() == before, (
        "blind construction under the default guard ran a Spark job"
    )
    # ... fail-closed at the first action, with the estimate and
    # routing advice in the message
    with pytest.raises(Exception, match="900 exceeds 100"):
        out.collect()
    with pytest.raises(Exception, match="event_sample_rate"):
        out.collect()

    # a sparse blind call passes the default guard and is exact
    sparse = _mk_events(
        spark, [(1, 1, 0), (2, 2, 10), (3, 3, 4 * 3600)]
    )
    got = sorted(
        map(tuple, ev.contact_pairs(sparse, tolerance_s=3600).collect())
    )
    want = sorted(
        map(
            tuple,
            ev.contact_pairs(
                sparse, tolerance_s=3600, density_guard="off"
            ).collect(),
        )
    )
    assert got == want == [(1, 2, 1)]

    # the routed form of the SAME dense stream runs: event sampling
    # bounds the candidate join itself, so it carries no guard
    routed = ev.contact_pairs(
        df, tolerance_s=3600, event_sample_rate=0.5
    )
    assert routed.count() > 0

    # legacy advisory mode warns (eagerly, documented)
    with pytest.warns(UserWarning, match="sample_rate"):
        ev.contact_pairs(df, tolerance_s=3600, density_guard="warn")

    # bounded modes and guard='off' are silent even on the dense frame
    with w.catch_warnings():
        w.simplefilter("error")
        ev.contact_pairs(df, tolerance_s=3600, sample_rate=0.5).count()
        ev.contact_pairs(df, tolerance_s=3600, min_contacts=5).count()
        ev.contact_pairs(df, tolerance_s=3600, top_k_per_user=2).count()
        ev.contact_pairs(
            df, tolerance_s=3600, density_guard="off"
        ).count()

    with pytest.raises(ValueError, match="density_guard"):
        ev.contact_pairs(df, density_guard="loud")


def test_contact_pairs_exact_path_plan_free_of_sampling_machinery(spark):
    """VERDICT r8 item 1: the round-8 sampling/degree-bound additions
    must be FREE on the exact path — its compiled plan carries no __h
    hash column, no md5, and no degree-prune semi-join. guard='warn'
    probes eagerly but leaves the plan identical; the DEFAULT
    (lazy 'raise') plan differs only by the broadcast 1-row guard
    subtree (raise_error), never by sampling machinery."""
    from diseasystore_spark.operators.events import contact_pairs

    df = _mk_events(spark, [(i, i % 5, i * 7) for i in range(40)])
    exact_off = contact_pairs(df, tolerance_s=3600, density_guard="off")
    exact_warn = contact_pairs(
        df, tolerance_s=3600, density_guard="warn"
    )  # blind, probes eagerly
    plan_off = exact_off._jdf.queryExecution().executedPlan().toString()
    plan_warn = exact_warn._jdf.queryExecution().executedPlan().toString()
    for plan in (plan_off, plan_warn):
        assert "md5" not in plan.lower()
        assert "__h" not in plan
        assert "LeftSemi" not in plan
    # warn-mode probe leaves the exact plan identical (modulo the
    # per-invocation expression ids / plan ids Spark stamps in)
    import re

    def norm(p: str) -> str:
        return re.sub(r"#\d+|plan_id=\d+", "#", p)

    assert norm(plan_off) == norm(plan_warn)

    # the DEFAULT blind plan carries the lazy guard (raise_error in a
    # broadcast 1-row subtree) and still no sampling machinery
    exact_default = contact_pairs(df, tolerance_s=3600)
    plan_default = (
        exact_default._jdf.queryExecution().executedPlan().toString()
    )
    assert "raise_error" in plan_default
    assert "md5" not in plan_default.lower()
    assert "__h" not in plan_default.replace("__dg_ok", "")
    assert "LeftSemi" not in plan_default

    sampled = contact_pairs(df, tolerance_s=3600, sample_rate=0.5)
    assert "md5" in sampled._jdf.queryExecution().executedPlan().toString().lower()


def test_contact_pairs_event_sampling_matches_python_oracle(spark):
    """event_sample_rate=q thins EVENTS (md5 threshold on the event
    id, seed domain "ev") before the candidate join — the mode that
    cuts join fan-in by q², not just emitted pairs. The selection is
    content-derived, so a Python replay of the same md5 predicate
    over the same fixture must reproduce the surviving event set and
    every downstream pair count exactly; q=1.0 must be a no-op."""
    import hashlib
    import random as _random
    from collections import Counter

    from diseasystore_spark.operators.events import contact_pairs

    rng = _random.Random(11)
    rows = [
        (eid, rng.randint(1, 9), rng.randint(0, 4 * 3600))
        for eid in range(300)
    ]
    df = _mk_events(spark, rows)
    q = 0.4
    threshold = int(round(q * 2**32))

    def kept(eid: int) -> bool:
        h = hashlib.md5(f"cp0\x1fev\x1f{eid}".encode()).hexdigest()
        return int(h[:8], 16) < threshold

    surviving = [r for r in rows if kept(r[0])]
    assert 0 < len(surviving) < len(rows)  # fixture thins for real

    expect = Counter()
    for ia, ua, sa in surviving:
        for ib, ub, sb in surviving:
            if ua == ub or not (sb >= sa and sb - sa <= 600):
                continue
            if not (sa < sb or ia < ib):
                continue
            expect[(min(ua, ub), max(ua, ub))] += 1

    got = {
        (r["user_a"], r["user_b"]): r["n_contacts"]
        for r in contact_pairs(
            df, tolerance_s=600, event_sample_rate=q
        ).collect()
    }
    assert got == dict(expect)

    # q = 1.0 is a no-op: identical to the exact form
    exact = {
        (r["user_a"], r["user_b"]): r["n_contacts"]
        for r in contact_pairs(df, tolerance_s=600).collect()
    }
    full = {
        (r["user_a"], r["user_b"]): r["n_contacts"]
        for r in contact_pairs(
            df, tolerance_s=600, event_sample_rate=1.0
        ).collect()
    }
    assert full == exact

    with pytest.raises(ValueError, match="event_sample_rate"):
        contact_pairs(df, event_sample_rate=0.0)
    with pytest.raises(ValueError, match="event_sample_rate"):
        contact_pairs(df, event_sample_rate=1.5)

    # NULL event ids: the thinning hash is NULL-PROPAGATING (like the
    # oracle's || concatenation), so a NULL-id event is dropped under
    # any q < 1 — its selection is undefined — while the exact form
    # (and q=1.0, which never filters) still counts it
    nid = spark.createDataFrame(
        [(0, "1996-01-01 00:00:10", 1), (None, "1996-01-01 00:00:20", 2)],
        "event_id bigint, ts0 string, user_id bigint",
    ).selectExpr("event_id", "CAST(ts0 AS TIMESTAMP) AS ts", "user_id")
    exact = contact_pairs(nid, tolerance_s=600).collect()
    assert len(exact) == 1 and exact[0]["n_contacts"] == 1
    # event id 0 survives q=0.4 (verified via kept()); the NULL-id
    # partner is dropped regardless -> no pairs remain
    assert kept(0)
    thinned = contact_pairs(
        nid, tolerance_s=600, event_sample_rate=q
    ).collect()
    assert thinned == []


def test_contact_pairs_event_sampling_counts_as_bounded(spark, monkeypatch):
    """An event-sampled call is a bounded production form: it must
    not trip the density guard probe even on a dense frame, and the
    thinning filter must sit BELOW the candidate join (both join
    sides scan the pre-filtered stream)."""
    import warnings as w

    from diseasystore_spark.operators import events as ev

    df = _mk_events(spark, [(i, i, i) for i in range(30)])
    monkeypatch.setattr(ev, "DENSE_CONTACT_CANDIDATES", 100)
    with w.catch_warnings():
        w.simplefilter("error")
        out = ev.contact_pairs(df, tolerance_s=3600, event_sample_rate=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the md5 threshold appears as a pushable Filter under the join,
    # not as a join-condition term: the join condition itself carries
    # no md5/conv (that is the pair-sampling device)
    join_lines = [l for l in plan.splitlines() if "Join" in l]
    assert join_lines, plan
    assert all("md5" not in l.lower() for l in join_lines), join_lines
    assert "md5" in plan.lower()
