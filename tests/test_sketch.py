"""HLL sketch rollups: error envelope vs exact distinct counts, and
the merge identity (shard sketches union to the whole-corpus answer)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diseasystore_spark.pipeline.sketch import (
    distinct_sketches,
    merge_sketch_rollup,
)


def _data(spark):
    # 4 sources x overlapping user ranges; exact distincts known.
    rows = []
    for s in range(4):
        for u in range(s * 500, s * 500 + 2000):  # 2000/source, overlaps
            rows.append((f"src{s}", u))
    return spark.createDataFrame(rows, "source string, user_id long")


def test_sketch_error_envelope(spark):
    df = _data(spark)
    out = {r["source"]: r["estimate"]
           for r in distinct_sketches(df, ["source"], "user_id").collect()}
    exact = {r["source"]: r["n"]
             for r in df.groupBy("source")
             .agg(F.count_distinct("user_id").alias("n")).collect()}
    for s in exact:
        assert abs(out[s] - exact[s]) / exact[s] < 0.05, (s, out[s], exact[s])


def test_sketch_merge_equals_direct(spark):
    """Union of per-source sketches must estimate the global distinct
    count exactly as a directly-built global sketch does (same
    binaries -> deterministic union), and land within the envelope of
    the exact answer."""
    df = _data(spark)
    per_source = distinct_sketches(df, ["source"], "user_id")
    merged = merge_sketch_rollup(per_source, []).collect()[0]
    direct = (
        df.agg(F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))).alias("e"))
        .collect()[0]["e"]
    )
    assert merged["estimate"] == direct
    exact = df.select("user_id").distinct().count()
    assert abs(merged["estimate"] - exact) / exact < 0.05


def test_sketch_validates(spark):
    df = _data(spark)
    with pytest.raises(ValueError, match="at least one"):
        distinct_sketches(df, [], "user_id")


def test_bloom_no_false_negatives_and_superset(spark):
    """Bloom flags must be a SUPERSET of the exact n-gram
    decontamination flags (no false negatives by construction), and
    with a roomy filter at this corpus size, exactly equal."""
    from diseasystore_spark.pipeline.dedup import ngram_decontaminate
    from diseasystore_spark.pipeline.sketch import bloom_decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corp = docs.where("doc_id % 97 != 0")
    bench = docs.where("doc_id % 97 = 0")
    exact = {
        r["doc_id"]
        for r in ngram_decontaminate(corp, bench, n=5, portable=True)
        .where("contaminated").collect()
    }
    got = {
        r["doc_id"]
        for r in bloom_decontaminate(corp, bench, n=5, m=1 << 20, k=4)
        .where("flagged").collect()
    }
    assert exact, "fixture should contain contaminated docs"
    assert got >= exact
    assert got == exact  # m=2^20 at this scale: FP odds ~ 0


def test_bloom_matches_python_reference_including_fps(spark):
    """Tiny filter (m=256, k=2) on a synthetic corpus: flags must
    equal a pure-Python md5 double-hash Bloom bit-for-bit — false
    positives included (they are deterministic, not noise)."""
    import hashlib

    from diseasystore_spark.pipeline.sketch import bloom_decontaminate

    P, M, K, N = 2147483647, 256, 2, 3

    def ab(g):
        h = hashlib.md5(g.encode()).hexdigest()
        return int(h[0:8], 16) % P, int(h[8:16], 16) % P

    def ngrams(text, n=N):
        w = text.strip().split()
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    import random

    rng = random.Random(11)
    bench_rows = [(100 + i, " ".join(rng.choices(words, k=8)))
                  for i in range(5)]
    corp_rows = [(i, " ".join(rng.choices(words, k=8))) for i in range(60)]

    bits = set()
    for _, t in bench_rows:
        for g in ngrams(t):
            a, b = ab(g)
            for i in range(K):
                bits.add((a + i * b) % M)

    def flagged_py(text):
        cnt = 0
        for g in ngrams(text):
            a, b = ab(g)
            if all((a + i * b) % M in bits for i in range(K)):
                cnt += 1
        return cnt

    want = {i: flagged_py(t) for i, t in corp_rows}
    corp = spark.createDataFrame(corp_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_flagged_ngrams"]
        for r in bloom_decontaminate(corp, bench, n=N, m=M, k=K).collect()
    }
    assert got == want
    assert any(v > 0 for v in want.values()), "fixture should flag some"


def test_bloom_prebuilt_filter_reuse(spark):
    """The prebuilt-filter path (build once, screen many batches) must
    equal the build-inline path."""
    from diseasystore_spark.pipeline.sketch import (
        bloom_build_ngrams,
        bloom_decontaminate,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "c d e f g h"), (3, "x y z w v u")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, "b c d e f g")], "doc_id long, text string")
    filt = bloom_build_ngrams(bench, n=4, m=1 << 12, k=3).localCheckpoint()
    inline = bloom_decontaminate(docs, bench, n=4, m=1 << 12, k=3).collect()
    reused = bloom_decontaminate(docs, n=4, bloom=filt).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, reused))
    import pytest

    with pytest.raises(ValueError, match="exactly one"):
        bloom_decontaminate(docs, bench, bloom=filt)
    with pytest.raises(ValueError, match="exactly one"):
        bloom_decontaminate(docs)


def test_cms_overcount_only_and_exact_at_width(spark):
    """Count-Min estimates are >= true counts ALWAYS, and equal when
    the width comfortably exceeds the vocabulary (no collisions)."""
    import collections
    import random

    from diseasystore_spark.pipeline.sketch import (
        cms_build_tokens,
        cms_estimate,
    )

    rng = random.Random(5)
    words = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choices(words, k=rng.randrange(3, 12))))
        for i in range(100)
    ]
    true = collections.Counter(
        t for _, text in rows for t in text.split()
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = spark.createDataFrame([(w,) for w in words], "term string")

    wide = cms_build_tokens(docs, depth=4, width=4096)
    got_wide = {
        r["term"]: r["est_count"]
        for r in cms_estimate(wide, terms, depth=4, width=4096).collect()
    }
    assert got_wide == dict(true)  # wide sketch: collision-free here

    narrow = cms_build_tokens(docs, depth=3, width=16)
    got_narrow = {
        r["term"]: r["est_count"]
        for r in cms_estimate(narrow, terms, depth=3, width=16).collect()
    }
    assert all(got_narrow[w] >= true[w] for w in words)
    assert any(got_narrow[w] > true[w] for w in words)  # collisions real


def test_cms_shard_merge_is_counter_sum(spark):
    """Linearity: counters built per shard and summed by (d, bucket)
    equal counters built over the whole corpus — the roll-up that
    lets incremental loads extend the sketch without re-scanning."""
    from pyspark.sql import functions as F

    from diseasystore_spark.pipeline.sketch import cms_build_tokens

    rows = [(i, f"t{i % 7} t{i % 3} shared") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    whole = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_build_tokens(docs, depth=3, width=32).collect()
    }
    a = cms_build_tokens(docs.where("doc_id % 2 = 0"), depth=3, width=32)
    b = cms_build_tokens(docs.where("doc_id % 2 = 1"), depth=3, width=32)
    merged = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in a.unionByName(b)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .collect()
    }
    assert merged == whole


def test_cms_geometry_metadata_validated(spark):
    """The counter frame is self-describing: estimate reads
    depth/width from it, and a caller-supplied mismatch raises
    instead of silently probing wrong buckets."""
    import pytest

    from diseasystore_spark.pipeline.sketch import (
        cms_build_tokens,
        cms_estimate,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "b c d")], "doc_id long, text string"
    )
    cms = cms_build_tokens(docs, depth=3, width=64)
    terms = spark.createDataFrame([("a",), ("b",)], "term string")
    # geometry from the frame alone
    got = {r["term"]: r["est_count"] for r in cms_estimate(cms, terms).collect()}
    assert got["a"] >= 2 and got["b"] >= 2
    # explicit matching geometry is accepted
    assert cms_estimate(cms, terms, depth=3, width=64).count() == 2
    with pytest.raises(ValueError, match="depth mismatch"):
        cms_estimate(cms, terms, depth=4, width=64).count()
    with pytest.raises(ValueError, match="width mismatch"):
        cms_estimate(cms, terms, depth=3, width=128).count()
    # a frame stripped of metadata needs explicit geometry
    bare = cms.drop("depth", "width")
    with pytest.raises(ValueError, match="no depth/width"):
        cms_estimate(bare, terms).count()
    assert cms_estimate(bare, terms, depth=3, width=64).count() == 2


def test_kll_exact_regime_matches_numpy_quantiles(spark):
    """k >= n: the sketch never compacts, and kll_quantiles IS
    quantile_cont (numpy linear interpolation) of the raw data."""
    import random

    import numpy as np

    from diseasystore_spark.pipeline.sketch import kll_build, kll_quantiles

    rng = random.Random(7)
    vals = [rng.uniform(-100, 100) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    sk = kll_build(df, "x", k=4096)
    rows = sk.collect()
    assert all(r["level"] == 0 for r in rows) and len(rows) == 2000
    qs = [0.0, 0.01, 0.37, 0.5, 0.925, 1.0]
    got = {r["q"]: r["value"] for r in kll_quantiles(sk, qs).collect()}
    exp = np.quantile(np.array(vals), qs)  # linear interpolation
    for q, e in zip(qs, exp):
        assert abs(got[q] - e) < 1e-9, (q, got[q], e)


def test_kll_compacted_rank_error_bounded(spark):
    """Production regime: k << n. The estimated quantile's RANK in
    the raw data must stay within a small fraction of n of the target
    rank (the KLL-style guarantee), across a skewed and a uniform
    distribution, and the sketch must stay small."""
    import random

    from diseasystore_spark.pipeline.sketch import kll_build, kll_quantiles

    rng = random.Random(31)
    n = 60_000
    datasets = {
        "uniform": [rng.uniform(0, 1) for _ in range(n)],
        "lognorm": [rng.lognormvariate(0, 2) for _ in range(n)],
    }
    for name, vals in datasets.items():
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        sk = kll_build(df, "x", k=256)
        rows = sk.collect()
        assert len(rows) < 256 * 12, f"{name}: sketch too large"
        svals = sorted(vals)
        qs = [0.01, 0.1, 0.5, 0.9, 0.99]
        got = {r["q"]: r["value"] for r in kll_quantiles(sk, qs).collect()}
        import bisect

        for q in qs:
            est = got[q]
            rank = bisect.bisect_left(svals, est)
            assert abs(rank - q * (n - 1)) <= 0.03 * n, (
                name, q, rank, q * n,
            )


def test_kll_merge_of_shards_bounds_and_k_mismatch(spark):
    """Sharded build + kll_merge answers like a whole-corpus build
    (both within the rank-error envelope; weights conserved exactly),
    and merging sketches with different k raises."""
    import bisect
    import random

    import pytest
    from pyspark.sql import functions as F

    from diseasystore_spark.pipeline.sketch import (
        kll_build,
        kll_merge,
        kll_quantiles,
    )

    rng = random.Random(97)
    n = 30_000
    vals = [rng.gauss(0, 10) for _ in range(n)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, x double"
    )
    shards = [
        kll_build(df.where(F.col("i") % 3 == m), "x", k=256) for m in range(3)
    ]
    merged = kll_merge(shards[0].unionByName(shards[1]).unionByName(shards[2]))
    # weight conservation: sum of 2^level == n exactly
    total = merged.selectExpr(
        "sum(shiftleft(cast(1 as bigint), level)) AS w"
    ).first()["w"]
    assert total == n
    svals = sorted(vals)
    got = {
        r["q"]: r["value"]
        for r in kll_quantiles(merged, [0.1, 0.5, 0.9]).collect()
    }
    for q in (0.1, 0.5, 0.9):
        rank = bisect.bisect_left(svals, got[q])
        assert abs(rank - q * (n - 1)) <= 0.04 * n
    other = kll_build(df, "x", k=128)
    with pytest.raises(Exception, match="different k"):
        kll_merge(shards[0].unionByName(other)).collect()


def test_kll_grouped_exact_and_compacted(spark):
    """Grouped sketches: exact per-group quantiles when k >= group
    size, bounded per-group rank error when compacted, groups fully
    independent (skewed group sizes don't cross-contaminate)."""
    import bisect
    import random

    import numpy as np

    from diseasystore_spark.pipeline.sketch import (
        kll_build_grouped,
        kll_quantiles_grouped,
    )

    rng = random.Random(11)
    data = {
        "a": [rng.uniform(0, 1) for _ in range(500)],
        "b": [rng.gauss(100, 5) for _ in range(3000)],
        "c": [float(i) for i in range(40)],
    }
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, x double")

    exact = kll_build_grouped(df, ["g"], "x", k=8192)
    got = {
        (r["g"], r["q"]): r["value"]
        for r in kll_quantiles_grouped(
            exact, ["g"], [0.0, 0.25, 0.5, 0.9, 1.0]
        ).collect()
    }
    for g, vs in data.items():
        exp = np.quantile(np.array(vs), [0.0, 0.25, 0.5, 0.9, 1.0])
        for q, e in zip([0.0, 0.25, 0.5, 0.9, 1.0], exp):
            assert abs(got[(g, q)] - e) < 1e-9, (g, q)

    small = kll_build_grouped(df, ["g"], "x", k=128)
    gq = {
        (r["g"], r["q"]): r["value"]
        for r in kll_quantiles_grouped(small, ["g"], [0.1, 0.5, 0.9]).collect()
    }
    for g, vs in data.items():
        sv = sorted(vs)
        n = len(sv)
        for q in (0.1, 0.5, 0.9):
            rank = bisect.bisect_left(sv, gq[(g, q)])
            assert abs(rank - q * (n - 1)) <= max(0.05 * n, 1.5), (g, q)


def test_kll_rolling_quantiles_windows_and_compaction(spark):
    """Rolling rollup correctness: each day's answer covers exactly
    its trailing window (verified exactly in the no-compaction
    regime), and in the compacted regime the answers stay within the
    per-window rank bound — without ever re-reading raw rows."""
    import bisect
    import datetime
    import random

    import numpy as np

    from diseasystore_spark.pipeline.sketch import (
        kll_build_grouped,
        kll_rolling_quantiles,
    )

    rng = random.Random(19)
    D0 = datetime.date(2024, 3, 1)
    per_day = {}
    rows = []
    for d in range(10):
        day = D0 + datetime.timedelta(days=d)
        vals = [rng.gauss(d * 10, 3) for _ in range(300)]
        per_day[day] = vals
        rows += [(str(day), v) for v in vals]
    df = spark.createDataFrame(rows, "day string, x double")

    sk = kll_build_grouped(df, ["day"], "x", k=4096)  # exact regime
    got = {
        (r["day"], r["q"]): r["value"]
        for r in kll_rolling_quantiles(sk, "day", [0.25, 0.75], 3).collect()
    }
    for day in per_day:
        window = []
        for b in range(3):
            window += per_day.get(day - datetime.timedelta(days=b), [])
        exp = np.quantile(np.array(window), [0.25, 0.75])
        for q, e in zip([0.25, 0.75], exp):
            assert abs(got[(day, q)] - e) < 1e-9, (day, q)

    sk2 = kll_build_grouped(df, ["day"], "x", k=64)  # compacted
    got2 = {
        (r["day"], r["q"]): r["value"]
        for r in kll_rolling_quantiles(sk2, "day", [0.5], 3).collect()
    }
    for day in per_day:
        window = sorted(
            v
            for b in range(3)
            for v in per_day.get(day - datetime.timedelta(days=b), [])
        )
        n = len(window)
        rank = bisect.bisect_left(window, got2[(day, 0.5)])
        assert abs(rank - 0.5 * (n - 1)) <= max(0.06 * n, 2), (day, rank, n)


def test_kll_sketch_parquet_roundtrip_and_cross_load_merge(spark, tmp_path):
    """Persistence contract: a sketch frame is plain (level, value, k)
    rows — write it as parquet, read it back later (or elsewhere),
    merge it with a sketch built from NEW data, and quantiles stay
    exact in the no-compaction regime. This is the epoch-over-epoch
    artifact workflow (build daily, persist, roll up any time) the
    Bloom/CMS sketches already test."""
    import random

    import numpy as np

    from diseasystore_spark.pipeline.sketch import (
        kll_build,
        kll_merge,
        kll_quantiles,
    )

    rng = random.Random(23)
    old = [rng.uniform(0, 50) for _ in range(800)]
    new = [rng.uniform(25, 100) for _ in range(700)]
    p = str(tmp_path / "epoch1_sketch")
    kll_build(
        spark.createDataFrame([(v,) for v in old], "x double"), "x", k=4096
    ).write.parquet(p)

    loaded = spark.read.parquet(p)
    merged = kll_merge(
        loaded.unionByName(
            kll_build(
                spark.createDataFrame([(v,) for v in new], "x double"),
                "x",
                k=4096,
            )
        )
    )
    got = {
        r["q"]: r["value"]
        for r in kll_quantiles(merged, [0.1, 0.5, 0.99]).collect()
    }
    exp = np.quantile(np.array(old + new), [0.1, 0.5, 0.99])
    for q, e in zip([0.1, 0.5, 0.99], exp):
        assert abs(got[q] - e) < 1e-9, (q, got[q], e)


def test_bloom_and_cms_parquet_roundtrip(spark, tmp_path):
    """Bloom filters and CMS counter frames are persistable artifacts
    like the KLL sketches: write to parquet, reload in a fresh frame,
    and every downstream estimate/screen is identical — the
    cross-session decontamination/term-count workflow."""
    from diseasystore_spark.pipeline.sketch import (
        bloom_build_ngrams,
        bloom_decontaminate,
        cms_build_tokens,
        cms_estimate,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "c d e f g h"), (3, "x y z w v u")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "b c d e f g")], "doc_id long, text string"
    )

    bp = str(tmp_path / "bloom")
    bloom_build_ngrams(bench, n=4, m=1 << 12, k=3).write.parquet(bp)
    direct = bloom_decontaminate(docs, bench, n=4, m=1 << 12, k=3).collect()
    via_disk = bloom_decontaminate(
        docs, n=4, bloom=spark.read.parquet(bp)
    ).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via_disk))

    cp = str(tmp_path / "cms")
    cms_build_tokens(docs, depth=4, width=64).write.parquet(cp)
    terms = spark.createDataFrame(
        [("c",), ("x",), ("nope",)], "term string"
    )
    live = cms_estimate(
        cms_build_tokens(docs, depth=4, width=64), terms
    ).collect()
    loaded = cms_estimate(spark.read.parquet(cp), terms).collect()
    assert sorted(map(tuple, live)) == sorted(map(tuple, loaded))


def test_mg_guarantees_on_skewed_stream(spark):
    """Misra-Gries invariants on a planted-heavy-hitter stream, built
    distributed (8 partitions): every count UNDERESTIMATES the true
    frequency by at most n/(m+1); every item with true frequency
    above n/(m+1) survives; mg_heavy_hitters reports every genuine
    heavy hitter (no false negatives)."""
    import random

    from diseasystore_spark.pipeline.sketch import (
        mg_build,
        mg_heavy_hitters,
    )

    rng = random.Random(7)
    stream = (
        ["hot_a"] * 400
        + ["hot_b"] * 250
        + ["warm"] * 80
        + [f"tail_{rng.randrange(500)}" for _ in range(1270)]
    )
    rng.shuffle(stream)
    n = len(stream)
    true = {}
    for s in stream:
        true[s] = true.get(s, 0) + 1

    df = spark.createDataFrame(
        [(s,) for s in stream], "item string"
    ).repartition(8)
    m = 50
    sketch = {r["item"]: r["count"] for r in mg_build(df, "item", m=m).collect()}
    assert len(sketch) <= m
    bound = n / (m + 1)
    for item, est in sketch.items():
        assert est <= true[item], f"{item} overcounted: {est} > {true[item]}"
        assert true[item] - est <= bound
    for item, f in true.items():
        if f > bound:
            assert item in sketch, f"guaranteed item {item} (f={f}) missing"

    hh = {
        r["item"]
        for r in mg_heavy_hitters(
            mg_build(df, "item", m=m), n_total=n, min_fraction=0.1
        ).collect()
    }
    assert {"hot_a", "hot_b"} <= hh  # 400/2000, 250/2000 >= 10%
    assert "warm" not in hh or true["warm"] >= 0.1 * n - bound


def test_mg_merge_of_shards_bound_and_m_mismatch(spark, tmp_path):
    """Sharded build -> parquet round-trip -> mg_merge keeps the
    combined n/(m+1) bound (mergeable-summaries combine rule); mixed
    m raises."""
    import pytest

    from diseasystore_spark.pipeline.sketch import mg_build, mg_merge

    s1 = ["x"] * 120 + ["y"] * 60 + [f"t{i}" for i in range(300)]
    s2 = ["x"] * 90 + ["z"] * 70 + [f"u{i}" for i in range(250)]
    d1 = spark.createDataFrame([(s,) for s in s1], "item string")
    d2 = spark.createDataFrame([(s,) for s in s2], "item string")
    m = 40
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    mg_build(d1, "item", m=m).write.parquet(p1)
    mg_build(d2, "item", m=m).write.parquet(p2)
    merged = {
        r["item"]: r["count"]
        for r in mg_merge(
            spark.read.parquet(p1).unionByName(spark.read.parquet(p2))
        ).collect()
    }
    n = len(s1) + len(s2)
    true = {}
    for s in s1 + s2:
        true[s] = true.get(s, 0) + 1
    assert len(merged) <= m
    for item, est in merged.items():
        assert est <= true[item]
        assert true[item] - est <= n / (m + 1)
    assert "x" in merged  # f=210 > 1030/41 ~ 25.1

    bad = mg_build(d2, "item", m=m + 1)
    with pytest.raises(Exception, match="different m"):
        mg_merge(
            spark.read.parquet(p1).unionByName(bad)
        ).collect()


# --------------------------------------------------- portable HLL


def test_hll_matches_hashlib_reference_and_error_envelope(spark):
    """Registers and estimate equal a pure-Python md5 HLL replay
    EXACTLY (integer denominator => deterministic doubles), and the
    estimate lands within the standard ~1.04/sqrt(m) envelope (x5
    slack) of the true cardinality."""
    import hashlib
    import random

    from diseasystore_spark.pipeline.sketch import (
        hll_build,
        hll_estimate,
    )

    rng = random.Random(13)
    vals = [f"v{rng.randrange(0, 8000)}" for _ in range(30000)]
    true_n = len(set(vals))
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    m = 256
    sk = hll_build(df, "x", m=m)
    got_regs = {
        r["reg"]: r["rank"] for r in sk.collect()
    }

    regs: dict[int, int] = {}
    for v in set(vals):
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        w = h // m
        rank = 53 if w == 0 else 53 - w.bit_length()
        reg = h % m
        regs[reg] = max(regs.get(reg, 0), rank)
    assert got_regs == regs

    est = hll_estimate(sk).collect()[0]
    pres = sum(1 << (53 - r) for r in regs.values())
    inv = pres + (m - len(regs)) * (1 << 53)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    want_est = alpha * m * m * float(1 << 53) / float(inv)
    assert est["inv_sum_num"] == inv
    assert est["est_distinct"] == want_est  # exact double equality
    assert est["n_zero"] == m - len(regs)
    assert abs(est["est_distinct"] / true_n - 1.0) < 5 * 1.04 / (m**0.5)


def test_hll_merge_equals_direct_and_validates(spark):
    from diseasystore_spark.pipeline.sketch import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    df = spark.createDataFrame(
        [(f"s{i % 3}", f"t{i % 700}") for i in range(5000)],
        "src string, tok string",
    )
    whole = hll_build(df, "tok", ["src"], m=64)
    shards = hll_merge(
        hll_build(df.where("tok < 't4'"), "tok", ["src"], m=64).unionByName(
            hll_build(df.where("tok >= 't4'"), "tok", ["src"], m=64)
        ),
        ["src"],
    )
    as_rows = lambda d: sorted(map(tuple, d.collect()))  # noqa: E731
    assert as_rows(whole) == as_rows(shards)
    assert as_rows(hll_estimate(whole, ["src"])) == as_rows(
        hll_estimate(shards, ["src"])
    )

    other = hll_build(df, "tok", ["src"], m=32)
    with pytest.raises(ValueError, match="mixed m"):
        hll_merge(whole.unionByName(other), ["src"])
    with pytest.raises(ValueError, match="power of two"):
        hll_build(df, "tok", m=100)


def test_hll_small_range_linear_counting(spark):
    """Regression (round-5 ADVICE): below 2.5m with empty registers
    the estimator must switch to linear counting m*ln(m/n_zero)
    (Flajolet et al. §4) — the raw harmonic mean is known-biased
    there. Exact double equality against the hand formula, and far
    tighter accuracy than the raw estimate at n=50, m=256."""
    import math

    from diseasystore_spark.pipeline.sketch import hll_build, hll_estimate

    n, m = 50, 256
    df = spark.createDataFrame([(f"v{i}",) for i in range(n)], "x string")
    est = hll_estimate(hll_build(df, "x", m=m)).collect()[0]
    assert est["n_zero"] > 0
    want = m * math.log(m / est["n_zero"])
    assert est["est_distinct"] == want
    # linear counting is tight in this regime (<10% at n/m ~ 0.2)
    assert abs(est["est_distinct"] / n - 1.0) < 0.1


def test_kll_bucketize_empty_sketch_fails_loud(spark):
    """Regression (round-5 ADVICE): an empty sketch frame (no
    boundaries) must raise at evaluation, not silently put every row
    in bucket 0."""
    import pytest

    from diseasystore_spark.pipeline.sketch import kll_bucketize, kll_build

    df = spark.createDataFrame([(1, 5.0), (2, 7.0)], "id bigint, v double")
    empty_sketch = kll_build(df.where("v > 1e9"), "v", k=64)
    out = kll_bucketize(df, "v", empty_sketch, n_buckets=4)
    with pytest.raises(Exception, match="n_buckets-1"):
        out.collect()


def test_hll_parquet_roundtrip(spark, tmp_path):
    from diseasystore_spark.pipeline.sketch import (
        hll_build,
        hll_estimate,
    )

    df = spark.createDataFrame(
        [(f"u{i % 123}",) for i in range(2000)], "x string"
    )
    sk = hll_build(df, "x", m=128)
    path = str(tmp_path / "hll")
    sk.write.parquet(path)
    loaded = spark.read.parquet(path)
    assert (
        hll_estimate(sk).collect() == hll_estimate(loaded).collect()
    )


def test_kll_bucketize_exact_and_compacted(spark):
    """Exact regime: buckets match numpy-quantile boundaries with the
    boundary-equality rule (value == boundary -> LOWER bucket); NULL
    values get NULL buckets; compacted regime: bucket populations are
    equi-probable within the KLL rank-error budget; collision and
    n_buckets validation raise."""
    import numpy as np

    from diseasystore_spark.pipeline.sketch import kll_bucketize, kll_build

    vals = [float(v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)] + [(999, None)],
        "id bigint, v double",
    )
    sk = kll_build(df, "v", k=1024)  # never compacts
    out = {r["id"]: r["bucket"] for r in kll_bucketize(df, "v", sk, n_buckets=4).collect()}
    bounds = np.quantile(np.array(vals), [0.25, 0.5, 0.75])
    for i, v in enumerate(vals):
        assert out[i] == int((v > bounds).sum()), (v, bounds)
    assert out[999] is None
    # a value exactly equal to a boundary sits in the LOWER bucket
    exact_b = float(bounds[1])
    hit = [i for i, v in enumerate(vals) if v == exact_b]
    for i in hit:
        assert out[i] == 1

    # compacted regime: rank guarantee => near-equal bucket sizes
    big = spark.range(10_000).selectExpr(
        "id", "cast(pmod(hash(id), 100000) as double) AS v"
    )
    sk2 = kll_build(big, "v", k=200)
    counts = (
        kll_bucketize(big, "v", sk2, n_buckets=10)
        .groupBy("bucket").count().collect()
    )
    sizes = {r["bucket"]: r["count"] for r in counts}
    assert set(sizes) == set(range(10))
    for b, n in sizes.items():
        assert abs(n - 1000) < 300, sizes  # ~1.7% KLL error at k=200

    import pytest as _pt

    with _pt.raises(ValueError, match="n_buckets"):
        kll_bucketize(df, "v", sk, n_buckets=1)
    with _pt.raises(ValueError, match="bucket"):
        kll_bucketize(df.withColumn("bucket", F.lit(1)), "v", sk)
