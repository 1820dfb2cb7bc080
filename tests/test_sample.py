"""Deterministic sampling / splitting / packing (pipeline/sample.py).

The load-bearing property is engine-portable determinism: membership
is a pure function of (key, salt) via MD5, so DuckDB evaluating the
same expression must agree byte-for-byte (that parity is what makes
q40-q42 oracle-checkable)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from diseasystore_spark.pipeline.sample import (
    hash_hex,
    hash_sample,
    hash_split,
    pack_sequences,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_hex_matches_duckdb(spark, docs):
    got = {
        (r.doc_id, r.h)
        for r in docs.select(
            "doc_id", hash_hex(F.col("doc_id"), "s1").alias("h")
        ).collect()
    }
    want = set(
        duckdb.sql(
            "SELECT doc_id, substr(md5('s1|' || doc_id::VARCHAR), 1, 8)"
            f" FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    assert got == want


def test_hash_sample_deterministic_and_monotone(spark, docs):
    n = docs.count()
    half = hash_sample(docs, "doc_id", 0.5, "s")
    quarter = hash_sample(docs, "doc_id", 0.25, "s")
    # deterministic: re-evaluating yields the identical id set
    ids1 = {r.doc_id for r in half.select("doc_id").collect()}
    ids2 = {r.doc_id for r in half.select("doc_id").collect()}
    assert ids1 == ids2
    # rate within binomial tolerance (n=100 at sf0.001)
    assert abs(len(ids1) / n - 0.5) < 0.2
    # nested thresholds: lowering the rate only removes rows
    qids = {r.doc_id for r in quarter.select("doc_id").collect()}
    assert qids <= ids1
    # a different salt decorrelates membership
    other = {
        r.doc_id
        for r in hash_sample(docs, "doc_id", 0.5, "t")
        .select("doc_id")
        .collect()
    }
    assert other != ids1


def test_hash_sample_plan_is_narrow(spark, docs):
    plan = (
        hash_sample(docs, "doc_id", 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_hash_split_partitions_corpus(spark, docs):
    out = hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, "sp"
    )
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    # every row has exactly one label (no dropped / duplicated rows)
    assert out.select("doc_id").distinct().count() == docs.count()


def test_hash_split_rejects_bad_weights(spark, docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="rate"):
        hash_sample(docs, "doc_id", 1.5)


def test_stratified_sample_exact_n(spark, docs):
    out = stratified_sample(docs, ["lang"], 5, "doc_id", "st")
    sizes = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    stratum = {
        r.lang: r["count"] for r in docs.groupBy("lang").count().collect()
    }
    for lang, n in stratum.items():
        assert sizes.get(lang, 0) == min(5, n)
    # deterministic selection
    a = sorted(r.doc_id for r in out.select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in stratified_sample(docs, ["lang"], 5, "doc_id", "st")
        .select("doc_id")
        .collect()
    )
    assert a == b


def test_pack_sequences_greedy_invariants(spark, docs):
    budget = 4096
    out = pack_sequences(
        docs, "n_chars", budget, "doc_id", strata=["lang"], salt="pk"
    )
    assert out.count() == docs.count()  # every doc packed exactly once
    rows = (
        out.groupBy("lang", "pack_id")
        .agg(F.sum("n_chars").alias("tot"))
        .collect()
    )
    max_doc = docs.agg(F.max("n_chars")).first()[0]
    by_lang: dict[str, dict[int, int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.pack_id] = r.tot
    for lang, packs in by_lang.items():
        ids = sorted(packs)
        assert ids == list(range(len(ids))), f"{lang}: non-contiguous packs"
        cum = 0
        for p in ids:
            # no pack overflows by more than one straddling document
            assert packs[p] < budget + max_doc, (lang, p, packs[p])
            cum += packs[p]
            if p < ids[-1]:
                # pack boundary only advances once the budget is met
                assert cum >= (p + 1) * budget, (lang, p, cum)


def test_pack_sequences_long_docs_stay_contiguous(spark):
    # Documents longer than the budget span several raw budget windows;
    # the dense_rank densify must keep pack ids gap-free.
    budget = 10
    rows = [(f"d{i}", "xx", n) for i, n in enumerate([3, 25, 4, 40, 2, 9, 1])]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    out = pack_sequences(
        df, "n_chars", budget, "doc_id", strata=["lang"], salt="pk"
    ).collect()
    assert len(out) == len(rows)  # each doc wholly in exactly one pack
    ids = sorted({r.pack_id for r in out})
    assert ids == list(range(len(ids))), ids
    assert len(ids) > 1  # the tiny corpus genuinely spans packs


def test_pack_sequences_unstratified_matches_single_stratum(spark):
    # strata=None with auto_strata=1 is one global greedy sequence;
    # it must equal packing with a constant explicit stratum.
    rows = [(f"d{i}", (i * 7) % 13 + 1) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "n"])
    a = {
        (r.doc_id, r.pack_id)
        for r in pack_sequences(
            df, "n", 20, "doc_id", salt="u", auto_strata=1
        ).collect()
    }
    b = {
        (r.doc_id, r.pack_id)
        for r in pack_sequences(
            df.withColumn("c", F.lit(1)), "n", 20, "doc_id",
            strata=["c"], salt="u",
        ).collect()
    }
    assert a == b


def test_pack_sequences_default_globally_contiguous(spark, docs):
    # The strata=None default packs under synthetic hash strata but
    # must still hand back globally contiguous pack ids that respect
    # the greedy budget-fill invariant within each synthetic stratum.
    budget = 4096
    out = pack_sequences(docs, "n_chars", budget, "doc_id", salt="g")
    assert out.count() == docs.count()
    ids = sorted(
        r["pack_id"] for r in out.select("pack_id").distinct().collect()
    )
    assert ids == list(range(len(ids))), "pack ids must be contiguous"
    assert len(ids) > 1


def test_temp_col_collision_safe(spark):
    # A pre-existing __rk / __raw_pack column must survive untouched.
    rows = [(f"d{i}", "xx", i + 1, "keep") for i in range(10)]
    df = spark.createDataFrame(
        rows, ["doc_id", "lang", "n_chars", "__rk"]
    ).withColumn("__raw_pack", F.lit("keep2"))
    s = stratified_sample(df, ["lang"], 3, "doc_id", "st")
    assert s.columns == df.columns and s.count() == 3
    assert {r["__rk"] for r in s.collect()} == {"keep"}
    p = pack_sequences(df, "n_chars", 7, "doc_id", strata=["lang"])
    assert set(df.columns) < set(p.columns)
    assert {r["__raw_pack"] for r in p.collect()} == {"keep2"}


def test_write_corpus_shards_deterministic(spark, docs, tmp_path):
    import hashlib

    from diseasystore_spark.pipeline.shard import (
        read_shard,
        write_corpus_shards,
    )

    n_shards = 4
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_corpus_shards(docs, p1, n_shards, "doc_id", salt="sh")
    write_corpus_shards(docs, p2, n_shards, "doc_id", salt="sh")

    back = read_shard(spark, p1)
    assert back.count() == docs.count()
    # membership is the documented md5 formula — recomputable anywhere
    got = {r["doc_id"]: r["shard"] for r in back.select("doc_id", "shard").collect()}
    for doc_id, shard in got.items():
        h = int(hashlib.md5(f"sh|{doc_id}".encode()).hexdigest()[:8], 16)
        assert shard == h % n_shards
    # identical across runs
    got2 = {
        r["doc_id"]: r["shard"]
        for r in read_shard(spark, p2).select("doc_id", "shard").collect()
    }
    assert got == got2
    # shard pruning reads exactly one shard's rows
    one = read_shard(spark, p1, shard=2)
    assert one.count() == sum(1 for s in got.values() if s == 2)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan, plan
    # balance: no shard more than 3x the ideal share (md5 is uniform)
    from collections import Counter
    sizes = Counter(got.values())
    assert max(sizes.values()) <= 3 * docs.count() / n_shards


def test_reshard_corpus_preserves_membership(spark, docs, tmp_path):
    """Resharding 8 -> 3 must (a) keep the row set identical, (b) land
    every row in the md5 bucket the new modulus dictates — i.e. be
    byte-equivalent to sharding the original corpus at 3 directly —
    and (c) keep the destination partition-prunable."""
    import hashlib

    from diseasystore_spark.pipeline.shard import (
        read_shard,
        reshard_corpus,
        write_corpus_shards,
    )

    src, dst, direct = (
        str(tmp_path / "src"),
        str(tmp_path / "dst"),
        str(tmp_path / "direct"),
    )
    write_corpus_shards(docs, src, 8, "doc_id", salt="rs")
    reshard_corpus(spark, src, dst, 3, "doc_id", salt="rs")
    write_corpus_shards(docs, direct, 3, "doc_id", salt="rs")

    back = read_shard(spark, dst)
    assert back.count() == docs.count()
    got = {
        r["doc_id"]: r["shard"]
        for r in back.select("doc_id", "shard").collect()
    }
    for doc_id, shard in got.items():
        h = int(hashlib.md5(f"rs|{doc_id}".encode()).hexdigest()[:8], 16)
        assert shard == h % 3
    want = {
        r["doc_id"]: r["shard"]
        for r in read_shard(spark, direct).select("doc_id", "shard").collect()
    }
    assert got == want
    one = read_shard(spark, dst, shard=1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan, plan


def test_epoch_shuffle_dense_permutation_and_seeds(spark):
    from diseasystore_spark.pipeline.sample import epoch_shuffle

    df = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id bigint"
    )
    out = epoch_shuffle(df, buckets=8)
    ranks = sorted(r["rank"] for r in out.collect())
    assert ranks == list(range(500))  # dense 0-based permutation
    # Deterministic per seed; different seeds permute differently.
    a = {r["doc_id"]: r["rank"] for r in epoch_shuffle(df, seed="e1").collect()}
    b = {r["doc_id"]: r["rank"] for r in epoch_shuffle(df, seed="e1").collect()}
    c = {r["doc_id"]: r["rank"] for r in epoch_shuffle(df, seed="e2").collect()}
    assert a == b
    assert a != c
    # Bucket count must not change the result.
    d = {r["doc_id"]: r["rank"]
         for r in epoch_shuffle(df, seed="e1", buckets=256).collect()}
    assert d == a
    with pytest.raises(ValueError, match="power of two"):
        epoch_shuffle(df, buckets=100)


def test_epoch_shuffle_no_global_window(spark):
    """The per-row rank window must be partitioned by the hash-prefix
    bucket — never a single unpartitioned global sort of the corpus."""
    from diseasystore_spark.pipeline.sample import epoch_shuffle

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        epoch_shuffle(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(__b" in plan, plan


def test_epoch_shuffle_matches_hashlib_oracle(spark):
    """Rank must equal the position in ascending (md5(seed|key), key)
    order computed independently in Python."""
    import hashlib

    from diseasystore_spark.pipeline.sample import epoch_shuffle

    ids = list(range(0, 400, 3))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = {r["doc_id"]: r["rank"]
           for r in epoch_shuffle(df, seed="e7", buckets=16).collect()}
    keyed = sorted(
        ids,
        key=lambda i: (hashlib.md5(f"e7|{i}".encode()).hexdigest()[:8], i),
    )
    want = {i: pos for pos, i in enumerate(keyed)}
    assert got == want


def test_build_mixture_matches_hashlib_oracle(spark):
    """Membership must equal the Python replication of the in-plan
    threshold math: rate = w*T/n, thr = round(rate * 2^32), keep iff
    int(md5('mixture|id')[:8], 16) < thr."""
    import hashlib

    from diseasystore_spark.pipeline.sample import build_mixture

    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    target = {"a": 0.6, "b": 0.4}
    n = {"a": sum(1 for _, s in rows if s == "a"),
         "b": sum(1 for _, s in rows if s == "b")}
    t = min(n[s] / w for s, w in target.items())
    thr = {s: round(target[s] * t / n[s] * 2**32) for s in target}
    want = {
        i for i, s in rows
        if int(hashlib.md5(f"mixture|{i}".encode()).hexdigest()[:8], 16)
        < thr[s]
    }
    got = {r["doc_id"] for r in build_mixture(df, target).collect()}
    assert got == want


def test_build_mixture_empty_when_targets_absent(spark):
    from diseasystore_spark.pipeline.sample import build_mixture

    df = spark.createDataFrame([(1, "x"), (2, "y")],
                               "doc_id long, source string")
    out = build_mixture(df, {"absent": 1.0})
    assert out.count() == 0  # no target stratum present -> empty mix


def test_epoch_shuffle_string_keys(spark):
    import hashlib

    from diseasystore_spark.pipeline.sample import epoch_shuffle

    ids = [f"doc-{i}" for i in range(60)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    got = {r["doc_id"]: r["rank"]
           for r in epoch_shuffle(df, buckets=4, seed="s").collect()}
    keyed = sorted(
        ids, key=lambda i: (hashlib.md5(f"s|{i}".encode()).hexdigest()[:8], i)
    )
    assert got == {i: p for p, i in enumerate(keyed)}


def test_stratified_sample_scalable_equals_naive(spark):
    """The two-level rank variant must select EXACTLY the rows the
    naive per-stratum window selects, including under a skewed
    stratum, tiny strata (|stratum| < n), and any bucket count."""
    import random

    from diseasystore_spark.pipeline.sample import (
        stratified_sample,
        stratified_sample_scalable,
    )

    rng = random.Random(23)
    rows = []
    for i in range(500):
        s = "big" if i % 10 else rng.choice(["small_a", "small_b"])
        rows.append((i, s))
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    want = {
        r["doc_id"]
        for r in stratified_sample(
            df, ["stratum"], 7, "doc_id", salt="x"
        ).collect()
    }
    for buckets in (1, 16, 1024):
        got = {
            r["doc_id"]
            for r in stratified_sample_scalable(
                df, ["stratum"], 7, "doc_id", salt="x", buckets=buckets
            ).collect()
        }
        assert got == want, buckets
    import pytest

    with pytest.raises(ValueError, match="power of two"):
        stratified_sample_scalable(df, ["stratum"], 7, "doc_id", buckets=3)


def test_weighted_sample_aes_properties(spark):
    """A-ES correctness: selection frequency tracks the weights
    across salts (heavy item wins ~w_h / sum(w) of the time), samples
    are without replacement, zero/NULL weights never appear, identical
    (corpus, salt) reproduces the identical selection, and the global
    form plans as a distributed TakeOrdered (no single-task window)."""
    from diseasystore_spark.pipeline.sample import weighted_sample

    rows = [(1, 1.0), (2, 1.0), (3, 1.0), (4, 10.0), (5, 0.0), (6, None)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    wins = 0
    trials = 120
    for s in range(trials):
        got = [
            r["doc_id"]
            for r in weighted_sample(df, 1, "w", salt=f"s{s}").collect()
        ]
        assert len(got) == 1 and got[0] in (1, 2, 3, 4)
        wins += got[0] == 4
    # P(heavy) = 10/13 ~ 0.77; allow a generous binomial envelope
    assert 0.6 <= wins / trials <= 0.92, wins / trials

    # without replacement: n=3 distinct ids, never the w<=0/NULL rows
    got3 = [
        r["doc_id"] for r in weighted_sample(df, 3, "w", salt="x").collect()
    ]
    assert len(set(got3)) == 3 and not {5, 6} & set(got3)
    # reproducibility
    again = [
        r["doc_id"] for r in weighted_sample(df, 3, "w", salt="x").collect()
    ]
    assert got3 == again

    plan = (
        weighted_sample(df, 3, "w", salt="x")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan

    # grouped form: exactly n per group
    g = spark.createDataFrame(
        [(i, "g" + str(i % 2), float(i % 7 + 1)) for i in range(1, 41)],
        "doc_id long, grp string, w double",
    )
    per = weighted_sample(g, 5, "w", by=["grp"], salt="y").groupBy(
        "grp"
    ).count().collect()
    assert {r["grp"]: r["count"] for r in per} == {"g0": 5, "g1": 5}


# ------------------------------------------------- contrastive triplets


def _h31_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 2147483647


def test_contrastive_triplets_match_hashlib_oracle(spark):
    """The negative pick is a pure function of the ids: recompute the
    bucket assignment and per-(pair, candidate) min-hash draw in
    hashlib and require the exact same triplets, and that every pair
    surviving the bucket draw appears exactly once."""
    from diseasystore_spark.pipeline.dedup import jaccard_pairs
    from diseasystore_spark.pipeline.sample import contrastive_triplets

    corpus = [
        (i, f"alpha beta gamma delta {w} epsilon zeta eta theta")
        for i, w in enumerate(
            ["x", "x", "y", "zz", "x", "q", "y", "r", "s", "t",
             "u", "v", "w", "aa", "bb", "cc"]
        )
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    B = 4
    got = {
        (r["anchor_id"], r["positive_id"]): (
            r["negative_id"], r["jaccard"])
        for r in contrastive_triplets(
            df, n=3, threshold=0.5, n_buckets=B
        ).collect()
    }

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(df, n=3, threshold=0.5).collect()
    }
    assert pairs, "fixture must produce near-dup pairs"
    buckets: dict[int, list[int]] = {}
    for i, _ in corpus:
        buckets.setdefault(_h31_py(str(i)) % B, []).append(i)
    want = {}
    for (a, b), j in pairs.items():
        t = _h31_py(f"{a}:{b}") % B
        cands = [c for c in buckets.get(t, []) if c not in (a, b)]
        if not cands:
            continue
        neg = min(cands, key=lambda c: (_h31_py(f"{a}:{b}:{c}"), c))
        want[(a, b)] = (neg, j)
    assert got == want
    assert all(a < p for a, p in got)
    assert all(n not in (a, p) for (a, p), (n, _) in got.items())


def test_contrastive_triplets_deterministic_across_runs(spark):
    from diseasystore_spark.pipeline.sample import contrastive_triplets

    df = spark.read.parquet(f"{SF}/documents.parquet")
    r1 = sorted(
        map(tuple, contrastive_triplets(
            df, threshold=0.2, n_buckets=8
        ).collect())
    )
    r2 = sorted(
        map(tuple, contrastive_triplets(
            df.repartition(7), threshold=0.2, n_buckets=8
        ).collect())
    )
    assert r1 == r2 and r1

    with pytest.raises(ValueError, match="n_buckets"):
        contrastive_triplets(df, n_buckets=0)


def test_contrastive_triplets_minhash_scale_path(spark):
    """pair_method='minhash': the negative draw is a pure function of
    the pair ids, so any (anchor, positive) produced by BOTH modes
    must carry the identical negative; unknown pair_method raises."""
    from diseasystore_spark.pipeline.sample import contrastive_triplets

    df = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        (r["anchor_id"], r["positive_id"]): r["negative_id"]
        for r in contrastive_triplets(
            df, threshold=0.5, n_buckets=8
        ).collect()
    }
    mh = {
        (r["anchor_id"], r["positive_id"]): r["negative_id"]
        for r in contrastive_triplets(
            df, threshold=0.5, n_buckets=8, pair_method="minhash"
        ).collect()
    }
    shared = set(exact) & set(mh)
    assert shared, "modes should agree on the planted near-dups"
    assert all(exact[p] == mh[p] for p in shared)

    with pytest.raises(ValueError, match="pair_method"):
        contrastive_triplets(df, pair_method="nope")


def test_group_safe_split_leakage_invariant(spark):
    """group_safe_split: (1) every member of a component carries the
    component's hash decision — near-dup twins can never straddle the
    split boundary; (2) keys absent from the component frame degrade
    to exactly hash_split on their own key with the same salt;
    (3) an existing group_col collides loudly."""
    from diseasystore_spark.pipeline.sample import group_safe_split

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 101)], "id bigint, text string"
    )
    # two components: {1..10} rep 1, {40, 41} rep 40; rest singletons
    comp = spark.createDataFrame(
        [(i, 1) for i in range(1, 11)] + [(40, 40), (41, 40)],
        "id bigint, component bigint",
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = group_safe_split(df, "id", comp, w, salt="ls").collect()
    by_id = {r["id"]: r for r in out}
    assert len(by_id) == 100  # unique build side: no fan-out
    first = by_id[1]["split"]
    assert all(by_id[i]["split"] == first for i in range(1, 11))
    assert all(by_id[i]["group_id"] == 1 for i in range(1, 11))
    assert by_id[40]["split"] == by_id[41]["split"]

    plain = {
        r["id"]: r["split"]
        for r in __import__(
            "diseasystore_spark.pipeline.sample", fromlist=["hash_split"]
        ).hash_split(df, "id", w, salt="ls").collect()
    }
    singletons = set(range(11, 101)) - {40, 41}
    assert all(by_id[i]["split"] == plain[i] for i in singletons)
    assert all(by_id[i]["group_id"] == i for i in singletons)

    with pytest.raises(ValueError, match="group_id"):
        group_safe_split(df.withColumn("group_id", F.lit(0)), "id", comp, w)


def test_curriculum_order_semantics(spark):
    """Stages are score-monotone (all stage-s scores <= all stage-s+1
    scores at never-compacted k), ranks are a dense 0..n-1 permutation
    ordered stage-first, a different seed reshuffles WITHIN stages
    without moving rows across stages, and NULL scores/ids drop."""
    from diseasystore_spark.pipeline.sample import curriculum_order

    rows = [(i, float((i * 37) % 100)) for i in range(200)]
    rows += [(None, 1.0), (999, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, score double")

    out = curriculum_order(
        df, "score", id_col="doc_id", n_stages=4, seed="e0"
    ).collect()
    assert len(out) == 200
    ranks = sorted(r["curriculum_rank"] for r in out)
    assert ranks == list(range(200))
    # stage-first ordering: rank order == stage order
    by_rank = sorted(out, key=lambda r: r["curriculum_rank"])
    stages = [r["stage"] for r in by_rank]
    assert stages == sorted(stages)
    # score-monotone stages
    max_per = {}
    min_per = {}
    for r in out:
        max_per[r["stage"]] = max(max_per.get(r["stage"], -1e9), r["score"])
        min_per[r["stage"]] = min(min_per.get(r["stage"], 1e9), r["score"])
    for s in range(3):
        assert max_per[s] <= min_per[s + 1]

    out2 = curriculum_order(
        df, "score", id_col="doc_id", n_stages=4, seed="e1"
    ).collect()
    stage_of = {r["doc_id"]: r["stage"] for r in out}
    assert all(stage_of[r["doc_id"]] == r["stage"] for r in out2)
    rank_of = {r["doc_id"]: r["curriculum_rank"] for r in out}
    assert any(rank_of[r["doc_id"]] != r["curriculum_rank"] for r in out2)

    import pytest

    with pytest.raises(ValueError, match="n_stages"):
        curriculum_order(df, "score", n_stages=1)


def test_group_safe_folds_component_integrity(spark):
    """All members of a component share one fold; folds partition
    [0,k); singletons degrade to their own-key fold; validation
    raises."""
    import pytest

    from diseasystore_spark.pipeline.sample import group_safe_folds

    df = spark.createDataFrame(
        [(i,) for i in range(1, 401)], "doc_id bigint"
    )
    comps = spark.createDataFrame(
        [(i, (i - 1) // 4 * 4 + 1) for i in range(1, 201)],
        "id bigint, component bigint",
    )  # components of 4 consecutive ids; 201..400 singletons
    out = group_safe_folds(df, "doc_id", comps, k=5, salt="cv").collect()
    assert len(out) == 400
    fold_of_group = {}
    for r in out:
        assert 0 <= r["fold"] < 5
        g = r["group_id"]
        assert fold_of_group.setdefault(g, r["fold"]) == r["fold"]
    # every fold is populated at this size
    assert {r["fold"] for r in out} == set(range(5))

    with pytest.raises(ValueError, match="at least 2"):
        group_safe_folds(df, "doc_id", comps, k=1)


def test_rendezvous_assign_minimal_movement(spark):
    """The HRW property: adding a shard moves keys ONLY onto the new
    shard (no key changes between surviving shards); weights steer
    the share; validation raises on bad shard tables."""
    import pytest

    from diseasystore_spark.pipeline.shard import rendezvous_assign

    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    before = {
        r["doc_id"]: r["shard"]
        for r in rendezvous_assign(df, [("a", 1.0), ("b", 1.0)]).collect()
    }
    after = {
        r["doc_id"]: r["shard"]
        for r in rendezvous_assign(
            df, [("a", 1.0), ("b", 1.0), ("c", 2.0)]
        ).collect()
    }
    moved = {k for k in before if before[k] != after[k]}
    assert moved, "new shard received nothing"
    assert all(after[k] == "c" for k in moved)  # moves only TO the new shard
    # weighted share: c (weight 2 of 4) should take roughly half
    share = len([k for k in after if after[k] == "c"]) / len(after)
    assert 0.4 < share < 0.6

    with pytest.raises(ValueError, match="unique"):
        rendezvous_assign(df, [("a", 1.0), ("a", 2.0)])
    with pytest.raises(ValueError, match="positive"):
        rendezvous_assign(df, [("a", 0.0)])
    with pytest.raises(ValueError, match="non-empty"):
        rendezvous_assign(df, [])


def test_temperature_mixture_weights_properties(spark):
    """alpha=0.5 weights: sum to 1, order-preserving, minority boosted
    / majority damped; alpha=1 is proportional (boost ~= 1);
    validation raises."""
    import pytest

    from diseasystore_spark.pipeline.sample import (
        temperature_mixture_weights,
    )

    rows = [(i, "big" if i % 10 else "small") for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, lang string")
    out = {
        r["group"]: r
        for r in temperature_mixture_weights(df, "lang").collect()
    }
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-12
    assert out["small"]["boost"] > 1.0 > out["big"]["boost"]
    # expected w_small = sqrt(0.1)/(sqrt(0.1)+sqrt(0.9))
    import math

    want = math.sqrt(0.1) / (math.sqrt(0.1) + math.sqrt(0.9))
    assert out["small"]["weight"] == pytest.approx(want, rel=1e-9)

    prop = {
        r["group"]: r
        for r in temperature_mixture_weights(df, "lang", alpha=1.0).collect()
    }
    assert prop["big"]["boost"] == pytest.approx(1.0, rel=1e-9)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mixture_weights(df, "lang", alpha=0.0)


def test_tar_shards_roundtrip_and_determinism(spark, tmp_path):
    """Pack -> unpack is the identity (names, payloads); shard
    membership matches the portable md5 bucketing; shard BYTES are
    deterministic across rewrites (zeroed mtimes, sorted members);
    validation raises."""
    import hashlib
    import os

    import pytest

    from pyspark.sql import functions as F

    from diseasystore_spark.pipeline.shard import (
        read_tar_shards,
        write_tar_shards,
    )

    rows = [(i, f"{i:04d}.txt", f"payload-{i}".encode()) for i in range(97)]
    df = spark.createDataFrame(
        rows, "doc_id long, member_name string, payload binary"
    )
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = {r["shard"]: r for r in write_tar_shards(df, out1, 3, key_col="doc_id").collect()}
    m2 = {r["shard"]: r for r in write_tar_shards(df, out2, 3, key_col="doc_id").collect()}
    assert sum(r["n_members"] for r in m1.values()) == 97
    # byte-determinism: same shard id -> identical file bytes
    for s in m1:
        h1 = hashlib.md5(open(m1[s]["path"], "rb").read()).hexdigest()
        h2 = hashlib.md5(open(m2[s]["path"], "rb").read()).hexdigest()
        assert h1 == h2
        assert m1[s]["n_bytes"] == os.path.getsize(m1[s]["path"])

    back = read_tar_shards(spark, out1 + "/shard-*.tar")
    got = {
        r["member_name"]: bytes(r["payload"]) for r in back.collect()
    }
    assert got == {n: p for _, n, p in rows}
    # membership matches the portable bucketing
    expect_shard = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("|"), F.col("doc_id").cast("string")
                            ).cast("binary")
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 3
            ).alias("s"),
        ).collect()
    }
    shard_of = {}
    for r in back.select("shard_path", "member_name").collect():
        doc = int(r["member_name"].split(".")[0])
        shard_of[doc] = int(r["shard_path"].split("shard-")[1][:5])
    assert shard_of == expect_shard

    with pytest.raises(ValueError, match="n_shards"):
        write_tar_shards(df, str(tmp_path / "x"), 0)
