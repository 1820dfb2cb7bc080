"""Training-data pipeline operators: dedup, similarity, text,
multimodal plumbing. The approximate operators (MinHash LSH, SimHash,
hyperplane ANN) are validated against their exact counterparts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_counts(spark, docs):
    from diseasystore_spark.pipeline.dedup import exact_dup_groups

    groups = exact_dup_groups(docs)
    total = groups.agg(F.sum("n_docs")).first()[0]
    assert total == docs.count()
    dup_docs = docs.union(docs)
    g2 = exact_dup_groups(dup_docs)
    assert g2.count() == groups.count()
    assert g2.agg(F.max("n_docs")).first()[0] >= 2


def test_jaccard_pairs_density_guard_fails_closed(spark, monkeypatch):
    """VERDICT r9 item 7: the exact shingle self-join is
    Sigma-df^2-bound — past DENSE_JACCARD_CANDIDATES a BLIND call
    (no max_df) raises by default with routing advice (minhash or a
    max_df cap); 'warn' downgrades, 'off' and max_df-bounded calls
    never trip, and the minhash route runs on the same corpus."""
    import warnings as w

    from diseasystore_spark.pipeline import dedup as dd

    # 30 identical 4-word docs: 2 shingles, df=30 each
    # -> est = 2 * C(30,2) = 870 > patched threshold 100
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(30)],
        "doc_id bigint, text string",
    )
    monkeypatch.setattr(dd, "DENSE_JACCARD_CANDIDATES", 100)

    with pytest.raises(ValueError, match="870.*minhash_lsh_pairs"):
        dd.jaccard_pairs(docs, n=3, threshold=0.5)

    # ADVICE r10 (duplicate-heavy corpus): near_dup_groups collapses
    # the 30 identical docs to ONE representative before the shingle
    # self-join, so the real candidate volume is zero — the guard
    # must count the collapsed representatives (what the join
    # actually fans out over), NOT the __m-weighted corpus, and the
    # production path must run. Pre-fix this raised with a
    # C(30,2)-scale estimate.
    groups = dd.near_dup_groups(docs, n=3, threshold=0.5)
    assert groups.count() == 30
    assert groups.select("component").distinct().count() == 1

    # Same pin on the direct call: huge weights on few rows describe
    # a collapsed corpus; the join runs over the 2 rows, so the blind
    # guard must not trip on the weighted estimate (2 * C(50,2) +
    # 1 * C(100,2) >> 100, but the real volume is 3 candidates).
    collapsed = spark.createDataFrame(
        [(1, "alpha beta gamma delta", 50), (2, "alpha beta gamma epsilon", 50)],
        "doc_id bigint, text string, grp bigint",
    )
    dd.jaccard_pairs(
        collapsed, n=3, threshold=0.5, df_weight_col="grp"
    ).count()

    # 30 DISTINCT docs sharing a hot shingle still trip the guard
    # through near_dup_groups (collapse keeps all 30 reps).
    distinct_docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i}") for i in range(30)],
        "doc_id bigint, text string",
    )
    with pytest.raises(ValueError, match="max_df"):
        dd.near_dup_groups(distinct_docs, n=3, threshold=0.5)

    with pytest.warns(UserWarning, match="minhash_lsh_pairs"):
        dd.jaccard_pairs(
            docs, n=3, threshold=0.5, density_guard="warn"
        ).count()

    with w.catch_warnings():
        w.simplefilter("error")
        # deliberate exact form and the bounded form are silent
        n_off = dd.jaccard_pairs(
            docs, n=3, threshold=0.5, density_guard="off"
        ).count()
        assert n_off == 30 * 29 // 2
        dd.jaccard_pairs(docs, n=3, threshold=0.5, max_df=5).count()
        # the routed scale path runs on the same corpus
        dd.minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3).count()

    with pytest.raises(ValueError, match="density_guard"):
        dd.jaccard_pairs(docs, density_guard="loud")


def test_containment_pairs_density_guard_fails_closed(spark, monkeypatch):
    """VERDICT r10 item 5 — guard parity: a BLIND containment call
    (no max_df) probes the fingerprint self-join's Sigma-C(df,2)
    volume and raises past the threshold with routing advice;
    bounded / 'off' calls never trip."""
    import warnings as w

    from diseasystore_spark.pipeline import dedup as dd

    # 30 identical docs share every fingerprint: est >> 100
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(30)],
        "doc_id bigint, text string",
    )
    monkeypatch.setattr(dd, "DENSE_JACCARD_CANDIDATES", 100)

    with pytest.raises(ValueError, match="max_df"):
        dd.containment_pairs(docs, k=4, window=3)
    with pytest.warns(UserWarning, match="max_df"):
        dd.containment_pairs(docs, k=4, window=3, density_guard="warn")
    with w.catch_warnings():
        w.simplefilter("error")
        n_off = dd.containment_pairs(
            docs, k=4, window=3, density_guard="off"
        ).count()
        assert n_off == 30 * 29 // 2
        dd.containment_pairs(docs, k=4, window=3, max_df=5).count()
    with pytest.raises(ValueError, match="density_guard"):
        dd.containment_pairs(docs, density_guard="loud")


def test_source_overlap_matrix_density_guard_fails_closed_and_lazy(
    spark, monkeypatch
):
    """VERDICT r10 item 5: a BLIND dense source_overlap_matrix call
    (max_sources_per_gram=None) cannot silently run the quadratic
    per-gram pairing — the lazy in-plan probe raises at first action
    (construction runs zero Spark jobs); capped (default) and 'off'
    calls never trip; 'warn' is the eager advisory mode."""
    import warnings as w

    from diseasystore_spark.pipeline import dedup as dd

    # 30 sources sharing one trigram: est = C(30,2) = 435 > 100
    df = spark.createDataFrame(
        [(i, f"s{i}", "alpha beta gamma") for i in range(30)],
        "doc_id bigint, source string, text string",
    )
    monkeypatch.setattr(dd, "DENSE_JACCARD_CANDIDATES", 100)

    jobs = spark.sparkContext._jsc.sc().dagScheduler()
    before = jobs.numTotalJobs()
    out = dd.source_overlap_matrix(
        df, n=3, max_sources_per_gram=None
    )
    assert jobs.numTotalJobs() == before, (
        "blind construction under the default guard ran a Spark job"
    )
    with pytest.raises(Exception, match="435 exceeds 100"):
        out.collect()
    with pytest.raises(Exception, match="source_overlap_minhash"):
        out.collect()

    with pytest.warns(UserWarning, match="max_sources_per_gram"):
        dd.source_overlap_matrix(
            df, n=3, max_sources_per_gram=None, density_guard="warn"
        )
    with w.catch_warnings():
        w.simplefilter("error")
        # capped default and deliberate 'off' both run (30 sources
        # within the default 64-source cap -> all C(30,2) pairs)
        assert dd.source_overlap_matrix(df, n=3).count() == 30 * 29 // 2
        n_off = dd.source_overlap_matrix(
            df, n=3, max_sources_per_gram=None, density_guard="off"
        ).count()
        assert n_off == 30 * 29 // 2
    with pytest.raises(ValueError, match="density_guard"):
        dd.source_overlap_matrix(df, density_guard="loud")


def test_minhash_lsh_finds_near_dups(spark, docs):
    """Every high-Jaccard pair should be an LSH candidate (banded
    MinHash with 4 bands of 4 catches J>=0.7 with high probability)."""
    from diseasystore_spark.pipeline.dedup import jaccard_pairs, minhash_lsh_pairs

    exact = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, n=3, threshold=0.7).collect()
    }
    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, num_hashes=16, bands=4, n=3).collect()
    }
    missed = exact - cand
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_shingles_short_docs(spark):
    """Docs shorter than n tokens must yield zero shingles, not crash:
    Spark's sequence(1, 0) is DESCENDING, so an unguarded position
    sequence feeds slice() a start of 0 (regression test)."""
    from diseasystore_spark.pipeline.dedup import (
        jaccard_pairs,
        minhash_signatures,
        word_ngrams,
    )

    df = spark.createDataFrame(
        [
            (1, "one two"),
            (2, "one"),
            (3, ""),
            (4, "one two three four"),
            (5, "one two three four"),
        ],
        "doc_id bigint, text string",
    )
    grams = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", word_ngrams("text", 3).alias("g")).collect()
    }
    assert grams[1] == [] and grams[2] == [] and grams[3] == []
    assert grams[4] == ["one two three", "two three four"]
    # end-to-end: short docs silently contribute nothing
    pairs = jaccard_pairs(df, n=3, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(4, 5)}
    sigs = minhash_signatures(df, n=3)
    assert {r["doc_id"] for r in sigs.collect()} == {4, 5}


def test_simhash_identical_docs_zero_distance(spark):
    from diseasystore_spark.pipeline.dedup import simhash_pairs

    df = spark.createDataFrame(
        [
            (1, "spark window batch join filter merge"),
            (2, "spark window batch join filter merge"),
            (3, "completely different words entirely here now"),
        ],
        "doc_id bigint, text string",
    )
    pairs = simhash_pairs(df, max_hamming=0).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_simhash_packed_lanes_match_python_majority_vote(spark, docs):
    """The 21-bit packed-lane aggregation must equal a straightforward
    per-bit majority vote. Token hashes come from Spark's xxhash64 so
    only the packing/vote arithmetic is under test."""
    from diseasystore_spark.pipeline.dedup import simhash64

    sample = docs.limit(50)
    tok_rows = (
        sample.select(
            F.col("doc_id"),
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .select("doc_id", F.xxhash64("tok").alias("h"))
        .collect()
    )
    by_doc: dict[int, list[int]] = {}
    for r in tok_rows:
        by_doc.setdefault(r["doc_id"], []).append(r["h"])
    expected = {}
    for doc_id, hashes in by_doc.items():
        n = len(hashes)
        sim = 0
        for b in range(64):
            set_cnt = sum((h >> b) & 1 for h in hashes)
            if 2 * set_cnt >= n:
                sim |= 1 << b
        if sim >= 2**63:  # reinterpret as signed long
            sim -= 2**64
        expected[doc_id] = sim
    actual = {
        r["doc_id"]: r["simhash"] for r in simhash64(sample).collect()
    }
    assert actual == expected


def test_simhash_banding_exact_at_high_threshold(spark, docs):
    """The chunk count scales with max_hamming, so the banded join's
    output must equal the brute-force hamming-<=-t pair set even past
    the old fixed-4-chunk guarantee (t=3)."""
    from diseasystore_spark.pipeline.dedup import simhash64, simhash_pairs

    sample = docs.limit(120)
    t = 6
    sims = {r["doc_id"]: r["simhash"] for r in simhash64(sample).collect()}
    ids = sorted(sims)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sims[a] ^ sims[b]) & (2**64 - 1)).count("1") <= t
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(sample, max_hamming=t).collect()
    }
    assert got == want


def test_ann_lsh_recall_against_exact(spark, emb):
    from diseasystore_spark.pipeline.similarity import (
        cosine_topk,
        hyperplane_lsh_topk,
    )

    queries = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = hyperplane_lsh_topk(emb, queries, k=5, num_planes=4, dim=64).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 4 planes -> 16 buckets over 100 vectors; recall is approximate
    # by construction but must be well above chance.
    assert recall >= 0.3, f"ANN recall too low: {recall}"
    # exact top-1 cosine must be monotonically ranked
    by_rank = [r["cosine"] for r in exact if r["query_id"] == 0]
    assert by_rank == sorted(by_rank, reverse=True)


def test_ivf_recall_against_exact(spark, emb):
    from diseasystore_spark.pipeline.similarity import cosine_topk, ivf_topk

    queries = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ivf_topk(
        emb, queries, k=5, n_clusters=8, n_probe=3, iterations=2
    ).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_text_stats_golden(spark):
    from diseasystore_spark.pipeline.text import text_stats

    df = spark.createDataFrame(
        [(1, "the quick brown fox! 42 jumps.")], "doc_id bigint, text string"
    )
    row = text_stats(df).first()
    assert row["n_tokens"] == 6
    assert row["n_chars_calc"] == 30
    assert row["n_distinct_tokens"] == 6
    assert row["punct_ratio"] == round(2 / 30, 4)
    assert row["digit_ratio"] == round(2 / 30, 4)
    assert row["stopword_ratio"] == round(1 / 6, 4)


def test_langid_markers(spark):
    from diseasystore_spark.pipeline.text import langid_heuristic

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is of to"),
            (2, "der hund und die katze ist ein"),
            (3, "xyzzy plugh foobar"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r["pred_lang"] for r in langid_heuristic(df).collect()}
    assert rows == {1: "en", 2: "de", 3: "und"}


def test_fingerprints_detect_containment(spark):
    from diseasystore_spark.pipeline.text import doc_fingerprints

    base = "spark window batch join filter merge scan sort hash agg"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra suffix words here"), (3, "zz qq ww ee rr tt")],
        "doc_id bigint, text string",
    )
    fps = doc_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    overlap_12 = len(by_doc[1] & by_doc[2]) / len(by_doc[1])
    overlap_13 = len(by_doc[1] & by_doc[3]) / len(by_doc[1])
    assert overlap_12 > 0.8
    assert overlap_13 == 0.0


def test_multimodal_plumbing(spark, docs):
    from diseasystore_spark.pipeline.multimodal import (
        attach_binary_payload,
        decode_image,
        extract_features,
        frame_sample,
    )

    payloads = attach_binary_payload(docs.limit(20))
    feats = extract_features(payloads).collect()
    assert len(feats) == 20
    for r in feats:
        assert r["byte_len"] > 0
        assert len(r["content_sha"]) == 64
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-9

    frames = frame_sample(payloads.limit(3), n_frames=4).collect()
    assert len(frames) == 12
    assert all(r["frame_len"] >= 1 for r in frames)

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG fake")


@pytest.mark.parametrize(
    "collect_threshold,algorithm",
    [(2_000_000, "label"), (0, "label"), (0, "star")],
)
def test_dedup_components_chain_and_cliques(spark, collect_threshold, algorithm):
    """Chain A-B-C-D (diameter 3), a separate pair, and an isolated
    clique must each collapse to min-id components — identically on
    the driver union-find path (default), the distributed propagation
    path (threshold 0), and the star-contraction path."""
    from diseasystore_spark.pipeline.dedup import dedup_components

    pairs = spark.createDataFrame(
        [
            (2, 1), (2, 3), (3, 4),          # chain {1,2,3,4}
            (10, 11),                        # pair {10,11}
            (20, 21), (21, 22), (20, 22),    # clique {20,21,22}
        ],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["component"]
        for r in dedup_components(
            pairs, collect_threshold=collect_threshold, algorithm=algorithm
        ).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


@pytest.mark.parametrize("collect_threshold", [2_000_000, 0])
def test_dedup_components_long_chain_converges(spark, collect_threshold):
    """A 30-node path graph needs diameter-many rounds — must still
    converge under the iteration cap and label every node with the
    chain's min id, on both physical strategies."""
    from diseasystore_spark.pipeline.dedup import dedup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    out = dedup_components(
        pairs, max_iterations=35, collect_threshold=collect_threshold
    ).collect()
    assert len(out) == 31
    assert all(r["component"] == 0 for r in out)


def test_dedup_components_star_beats_diameter(spark):
    """Star contraction must label a 64-node path graph (diameter 64)
    within O(log^2 n) rounds — 12 here, where min-label propagation
    provably cannot finish (needs ~diameter rounds). The adversarial
    shape for label propagation: containment chains from
    fingerprinting."""
    from diseasystore_spark.pipeline.dedup import dedup_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    out = dedup_components(
        pairs, max_iterations=12, collect_threshold=0, algorithm="star"
    ).collect()
    assert len(out) == 65
    assert all(r["component"] == 0 for r in out)
    # sanity: label propagation at the same cap does NOT converge
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_components(
            pairs, max_iterations=12, collect_threshold=0, algorithm="label"
        )


def test_dedup_components_star_random_vs_unionfind(spark):
    """Property check: star contraction equals driver union-find on a
    pseudo-random graph (fixed seed) with many components."""
    import random

    from diseasystore_spark.pipeline.dedup import dedup_components

    rng = random.Random(7)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    star = {
        r["id"]: r["component"]
        for r in dedup_components(
            pairs, collect_threshold=0, algorithm="star"
        ).collect()
    }
    uf = {
        r["id"]: r["component"]
        for r in dedup_components(pairs).collect()
    }
    assert star == uf


def test_dedup_components_canonical_filter_dedups(spark, docs):
    """End-to-end: jaccard pairs -> components -> keeping canonicals
    removes every near-dup pair."""
    from diseasystore_spark.pipeline.dedup import (
        dedup_components,
        jaccard_pairs,
    )

    pairs = jaccard_pairs(docs, threshold=0.2)
    if pairs.head(1):
        comps = dedup_components(pairs)
        kept = comps.where(F.col("id") == F.col("component"))
        # no surviving pair has both endpoints kept
        surviving = (
            pairs.join(kept.select(F.col("id").alias("id_a")), "id_a")
            .join(kept.select(F.col("id").alias("id_b")), "id_b")
        )
        assert surviving.count() == 0


def test_multimodal_resize_plumbing(spark, docs):
    from diseasystore_spark.pipeline.multimodal import (
        attach_binary_payload,
        resize_payload,
    )

    payloads = attach_binary_payload(docs.limit(20))
    out = resize_payload(payloads, target_bytes=64).collect()
    assert len(out) == 20
    for r in out:
        assert r["byte_len"] == min(r["orig_byte_len"], 64)
        assert len(r["payload"]) == r["byte_len"]
        if r["orig_byte_len"] <= 64:
            assert r["scale"] == 1.0
        else:
            assert 0 < r["scale"] < 1
    # deterministic: same input -> same bytes
    again = resize_payload(payloads, target_bytes=64).collect()
    assert {(r["doc_id"], bytes(r["payload"])) for r in out} == {
        (r["doc_id"], bytes(r["payload"])) for r in again
    }


def test_chunk_documents_invariants(spark, docs):
    from diseasystore_spark.pipeline.text import chunk_documents

    max_chars = 120
    chunks = chunk_documents(docs, max_chars=max_chars).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    originals = {
        r["doc_id"]: " ".join(r["text"].strip().split())
        for r in docs.collect()
    }
    assert set(by_doc) == set(originals)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        # contiguous ids from 0
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        # order-exact reassembly recovers the normalized document
        assert " ".join(r["chunk_text"] for r in rows) == originals[doc_id]
        longest_tok = max(len(t) for t in originals[doc_id].split(" "))
        for r in rows:
            assert r["n_chars"] == len(r["chunk_text"])
            # bounded straddle slack: overflow < one token (+ space)
            assert r["n_chars"] < max_chars + longest_tok + 1


def test_chunk_documents_long_token(spark):
    from diseasystore_spark.pipeline.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "aa " + "x" * 50 + " bb cc")], "doc_id bigint, text string"
    )
    rows = sorted(
        chunk_documents(df, max_chars=10).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
    assert " ".join(r["chunk_text"] for r in rows) == "aa " + "x" * 50 + " bb cc"


def test_minhash_lsh_join_cross_corpus(spark, docs):
    """A near-dup pair split across the two sides must be found, and
    ids must come from the right sides."""
    from diseasystore_spark.pipeline.dedup import (
        minhash_lsh_join,
        minhash_lsh_pairs,
    )

    # Pairs within the whole corpus (candidates for the split check).
    pairs = minhash_lsh_pairs(docs, min_est_jaccard=0.5).collect()
    assert pairs, "test corpus should contain near-duplicates"
    a_ids = {r["id_a"] for r in pairs}
    left = docs.where(F.col("doc_id").isin(*a_ids))
    right = docs.where(~F.col("doc_id").isin(*a_ids))
    joined = minhash_lsh_join(left, right, min_est_jaccard=0.5).collect()
    got = {(r["left_id"], r["right_id"]) for r in joined}
    # every (a in left, b in right) pair from the self-join must appear
    want = {
        (r["id_a"], r["id_b"])
        for r in pairs
        if r["id_a"] in a_ids and r["id_b"] not in a_ids
    }
    assert want <= got
    l_ids = {r["doc_id"] for r in left.collect()}
    for lid, rid in got:
        assert lid in l_ids and rid not in l_ids


def test_minhash_lsh_join_overlapping_corpora_no_self_pairs(spark, docs):
    """Screening a batch that was already ingested into the corpus
    must not flag each shared document as a trivial self-pair."""
    from diseasystore_spark.pipeline.dedup import minhash_lsh_join

    joined = minhash_lsh_join(docs, docs, min_est_jaccard=0.5).collect()
    assert joined, "overlapping corpora should still surface real near-dups"
    assert all(r["left_id"] != r["right_id"] for r in joined)


def test_minhash_lsh_join_precomputed_right_signatures(spark, docs):
    """Passing right_signatures= must reproduce the from-text result
    exactly (the streaming per-batch path depends on this parity)."""
    from diseasystore_spark.pipeline.dedup import (
        minhash_lsh_join,
        minhash_signatures,
    )

    left = docs.where(F.col("doc_id") % 2 == 0)
    right = docs.where(F.col("doc_id") % 2 == 1)
    base = {
        (r["left_id"], r["right_id"], r["est_jaccard"])
        for r in minhash_lsh_join(left, right, min_est_jaccard=0.5).collect()
    }
    sigs = minhash_signatures(right).localCheckpoint()
    pre = {
        (r["left_id"], r["right_id"], r["est_jaccard"])
        for r in minhash_lsh_join(
            left, None, min_est_jaccard=0.5, right_signatures=sigs
        ).collect()
    }
    assert pre == base


def test_near_dup_groups_equals_full_corpus_components(spark, docs):
    """The exact-collapse-first composition must assign the same
    component to every pair-participating document as running
    components over the FULL corpus pair list, and must cover every
    document (singletons canonical)."""
    from diseasystore_spark.pipeline.dedup import (
        dedup_components,
        jaccard_pairs,
        near_dup_groups,
    )

    got = {
        r["doc_id"]: (r["component"], r["is_canonical"])
        for r in near_dup_groups(docs, threshold=0.2).collect()
    }
    assert len(got) == docs.count()
    full = {
        r["id"]: r["component"]
        for r in dedup_components(
            jaccard_pairs(docs, threshold=0.2)
        ).collect()
    }
    assert full, "fixture should contain near-duplicates"
    for doc_id, comp in full.items():
        assert got[doc_id][0] == comp, doc_id
    # docs outside any pair are their own canonical unless they are
    # exact duplicates of an earlier doc
    for doc_id, (comp, canon) in got.items():
        if doc_id not in full:
            assert canon == (comp == doc_id)
            assert comp <= doc_id


def test_containment_catches_what_minhash_misses(spark):
    """A short doc pasted verbatim inside a much longer one has near-1
    containment but tiny Jaccard: containment_pairs must flag it;
    minhash_lsh_pairs (Jaccard-estimating) must NOT at a normal
    threshold — the two operators cover complementary failure
    modes."""
    from diseasystore_spark.pipeline.dedup import (
        containment_pairs,
        minhash_lsh_pairs,
    )

    import random

    rng = random.Random(3)
    vocab = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa"]
    short = " ".join(rng.choice(vocab) for _ in range(12))
    long_doc = (
        " ".join(rng.choice(vocab) for _ in range(150))
        + " " + short + " "
        + " ".join(rng.choice(vocab) for _ in range(150))
    )
    noise = [
        " ".join(rng.choice(vocab) for _ in range(80)) for _ in range(8)
    ]
    rows = [(1, short), (2, long_doc)] + [
        (10 + i, t) for i, t in enumerate(noise)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    cont = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(df, min_containment=0.6).collect()
    }
    assert (1, 2) in cont
    mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, min_est_jaccard=0.5).collect()
    }
    assert (1, 2) not in mh


def test_repetition_stats_match_python(spark):
    """Repetition fractions must equal a direct Python computation,
    including a pathologically repetitive document."""
    from collections import Counter

    from diseasystore_spark.pipeline.text import repetition_stats

    corpus = [
        (1, "spam spam spam spam spam spam"),
        (2, "one two three four five six seven"),
        (3, "ab cd ab cd ab cd xy"),
    ]
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    for doc_id, text in corpus:
        toks = text.split()
        for n in (2, 3):
            ngrams = [
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ]
            c = Counter(ngrams)
            r = got[doc_id]
            assert r[f"ngrams_{n}"] == len(ngrams)
            assert r[f"distinct_{n}"] == len(c)
            assert r[f"top_{n}"] == max(c.values())
            assert r[f"dup_frac_{n}"] == round(
                (len(ngrams) - len(c)) / len(ngrams), 4
            )


def test_tfidf_and_bm25_match_python_oracle(spark):
    """TF-IDF and BM25 rankings must equal a pure-Python computation
    of the same integer-micro-scaled formulas, including term
    tie-breaks and the min_df filter."""
    import math
    from collections import Counter

    from diseasystore_spark.pipeline.text import (
        bm25_top_terms,
        tfidf_top_terms,
    )

    corpus = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "cats and dogs and cats"),
        (4, "a completely different sentence entirely"),
        (5, "the the the the"),
    ]
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    docs = {i: t.split() for i, t in corpus}
    n = len(docs)
    tfs = {i: Counter(toks) for i, toks in docs.items()}
    dfreq = Counter(t for c in tfs.values() for t in c)
    avgdl = sum(len(t) for t in docs.values()) / n

    def py_topk(score_fn, k=3):
        out = set()
        for i, c in tfs.items():
            scored = sorted(
                ((score_fn(tf, dfreq[t], len(docs[i])), t) for t, tf in c.items()),
                key=lambda x: (-x[0], x[1]),
            )
            for rank, (s, t) in enumerate(scored[:k], 1):
                out.add((i, t, rank, s))
        return out

    def tfidf(tf, dfq, dl):
        return tf * round(math.log(n / dfq) * 1e6)

    def bm25(tf, dfq, dl):
        idf_micro = round(math.log(1 + (n - dfq + 0.5) / (dfq + 0.5)) * 1e6)
        return round(
            idf_micro * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        )

    got = {
        (r["doc_id"], r["term"], r["rank"], r["score_micro"])
        for r in tfidf_top_terms(df, k=3).collect()
    }
    assert got == py_topk(tfidf)
    got = {
        (r["doc_id"], r["term"], r["rank"], r["score_micro"])
        for r in bm25_top_terms(df, k=3).collect()
    }
    assert got == py_topk(bm25)
    # min_df drops hapax terms from the ranking entirely
    hapax_free = tfidf_top_terms(df, k=3, min_df=2).collect()
    assert all(r["df"] >= 2 for r in hapax_free)


def test_embedding_dupes_block_grid_matches_brute_force(spark, emb):
    """The distributed block-grid matmul must reproduce the exact
    all-pairs result for any block count (1 block = one cell; many
    blocks = the full grid with cross-block orientation), with no pair
    emitted twice."""
    import numpy as np

    from diseasystore_spark.pipeline.similarity import embedding_dupes

    rows = emb.limit(300).collect()
    sub = spark.createDataFrame(rows, emb.schema)
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    ia, ib = np.where((sims >= 0.35) & (ids[:, None] < ids[None, :]))
    want = {(int(ids[i]), int(ids[j])) for i, j in zip(ia, ib)}

    for blocks in (1, 5):
        got = embedding_dupes(sub, threshold=0.35, n_blocks=blocks).collect()
        pairs = [(r["id_a"], r["id_b"]) for r in got]
        assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
        assert set(pairs) == want, f"mismatch at n_blocks={blocks}"


def test_embedding_dupes_bucketed_subset_of_exact(spark, emb):
    """The IVF-bucketed pair set must be a subset of the exact
    all-pairs result with identical cosines (pruning may only drop
    cross-cluster pairs, never invent or rescore)."""
    from diseasystore_spark.pipeline.similarity import (
        embedding_dupes,
        embedding_dupes_bucketed,
    )

    exact = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 4)
        for r in embedding_dupes(emb, threshold=0.35).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 4)
        for r in embedding_dupes_bucketed(emb, threshold=0.35).collect()
    }
    assert bucketed, "bucketed path should find within-cluster pairs"
    assert set(bucketed) <= set(exact)
    for pair, cos in bucketed.items():
        assert abs(cos - exact[pair]) <= 1e-4, pair


def test_embedding_dupes_bucketed_assignment_computed_once(spark, emb):
    """Round-9 perf pin: the bucketed self-join's two sides must sit
    above ONE shared assignment subtree — the pre-split
    repartition("cluster") makes both sides' shuffle subtrees
    canonically identical, so AQE's exchange reuse materializes the
    (expensive, k-dot) assignment shuffle once and feeds both join
    sides from it (measured sf1: 120.9 s -> 29.0 s). Reuse is a
    RUNTIME decision: it only shows in the AQE final plan after an
    action, and only in the shuffled-join regime (at toy size AQE
    would broadcast one side instead, which recomputes assignment —
    fine at broadcast scale), so the test pins the final plan with
    broadcasting disabled."""
    from diseasystore_spark.pipeline.similarity import (
        embedding_dupes_bucketed,
    )

    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    prev = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, "-1")
        df = embedding_dupes_bucketed(emb, threshold=0.35)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "isFinalPlan=true" in plan, plan.splitlines()[0]
    assert "ReusedExchange" in plan, (
        f"assignment exchange not reused across the self-join:\n{plan}"
    )


def test_ivf_portable_assignment_matches_numpy(spark, emb):
    """The JVM argmin assignment (portable/oracle path) and the numpy
    GEMM assignment must produce identical top-k output for the fixed
    quantizer (they compute the same distances up to ulp; no ties in
    the synthetic data)."""
    from diseasystore_spark.pipeline.similarity import ivf_topk

    queries = emb.where(F.col("vec_id") < 10)
    kw = dict(k=5, n_clusters=8, n_probe=3, iterations=0)
    a = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_topk(emb, queries, portable=True, **kw).collect()
    }
    b = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_topk(emb, queries, portable=False, **kw).collect()
    }
    assert a == b


def test_curate_corpus_invariants(spark, docs):
    """Curation = dedup-to-representative ∩ language ∩ quality floor,
    cross-checked against the standalone operators it composes."""
    from diseasystore_spark.pipeline.dedup import exact_dup_groups
    from diseasystore_spark.pipeline.text import (
        curate_corpus,
        langid_heuristic,
        text_stats,
    )

    out = {r["doc_id"]: r for r in curate_corpus(docs, min_quality=0.1).collect()}
    reps = {r["rep_id"] for r in exact_dup_groups(docs).collect()}
    quality = {r["doc_id"]: r["quality_score"] for r in text_stats(docs).collect()}
    lang = {r["doc_id"]: r["pred_lang"] for r in langid_heuristic(docs).collect()}
    expected = {
        d for d in reps if quality[d] >= 0.1 and lang[d] == "en"
    }
    assert set(out) == expected
    for d, r in out.items():
        assert r["quality_score"] == quality[d]
        assert r["pred_lang"] == lang[d]
    # duplicated corpus: non-representatives must not leak through
    out2 = curate_corpus(docs.union(docs), min_quality=0.1).count()
    assert out2 == len(expected)


def test_minhash_max_bucket_caps_degenerate_corpus(spark):
    """A corpus of identical documents collapses into one bucket per
    band; max_bucket must drop the hotspot while leaving normal
    buckets (and pairs still reachable through them) intact."""
    from diseasystore_spark.pipeline.dedup import minhash_lsh_pairs

    clones = [(i, "same words repeated over and over again forever") for i in range(40)]
    distinct_pair = [
        (100, "an entirely different document about spark shuffles"),
        (101, "an entirely different document about spark shuffles"),
    ]
    df = spark.createDataFrame(
        clones + distinct_pair, "doc_id bigint, text string"
    )
    uncapped = minhash_lsh_pairs(df).count()
    assert uncapped >= 40 * 39 / 2  # the quadratic clique is real
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, max_bucket=10).collect()
    }
    assert (100, 101) in capped  # small buckets unaffected
    assert all(a >= 100 for a, _ in capped)  # clique suppressed


def test_dedup_lines_keep_first_and_exemption(spark):
    """Global keep-first semantics: a line repeated across documents
    survives only at its (id, pos)-minimal occurrence; lines below
    min_chars are exempt; a fully-deduplicated document survives with
    empty text_clean."""
    from diseasystore_spark.pipeline.text import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "alpha beta\nshared line\nx"),
            (2, "shared line\ngamma delta\nx"),
            (3, "shared line"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines(df, min_chars=2).collect()}
    assert out[1]["text_clean"] == "alpha beta\nshared line\nx"
    assert out[1]["n_lines"] == 3 and out[1]["n_lines_kept"] == 3
    # doc 2 loses its copy of the shared line; the exempt "x" stays
    assert out[2]["text_clean"] == "gamma delta\nx"
    assert out[2]["n_lines"] == 3 and out[2]["n_lines_kept"] == 2
    # doc 3 is nothing but the shared line: survives, empty
    assert out[3]["text_clean"] == ""
    assert out[3]["n_lines"] == 1 and out[3]["n_lines_kept"] == 0


def test_dedup_lines_intra_document_repeats(spark):
    """Repeats inside one document dedup to the earliest position and
    reassembly preserves original line order."""
    from diseasystore_spark.pipeline.text import dedup_lines

    df = spark.createDataFrame(
        [(7, "b line\na line\nb line\nc line\na line")],
        "doc_id bigint, text string",
    )
    row = dedup_lines(df).first()
    assert row["text_clean"] == "b line\na line\nc line"
    assert row["n_lines"] == 5 and row["n_lines_kept"] == 3


def test_redact_pii_counts_and_tokens(spark):
    from diseasystore_spark.pipeline.pii import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d+x@e-f.org, ip 192.168.0.1 twice 10.0.0.255"),
            (2, "call 555-123-4567 or 555.987.6543; ssn 123-45-6789"),
            (3, "clean text with no pii at all"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_ipv4"] == 2
    assert out[1]["n_pii_total"] == 4
    assert "<EMAIL>" in out[1]["text_redacted"]
    assert "192.168.0.1" not in out[1]["text_redacted"]
    assert out[2]["n_phone"] == 2 and out[2]["n_ssn"] == 1
    assert out[2]["text_redacted"] == "call <PHONE> or <PHONE>; ssn <SSN>"
    assert out[3]["n_pii_total"] == 0
    assert out[3]["text_redacted"] == out[3]["text_redacted"]


def test_redact_pii_custom_patterns(spark):
    from diseasystore_spark.pipeline.pii import redact_pii
    import pytest as _pytest

    df = spark.createDataFrame([(1, "key AKIA1234 ok")], "doc_id bigint, text string")
    out = redact_pii(
        df, patterns={"aws_key": (r"\bAKIA[0-9A-Z]+\b", "<KEY>")}
    ).first()
    assert out["n_aws_key"] == 1 and out["text_redacted"] == "key <KEY> ok"
    assert out["n_pii_total"] == 1
    with _pytest.raises(ValueError):
        redact_pii(df, patterns={})


def test_vocab_coverage_corpus_trained_and_external(spark):
    from diseasystore_spark.pipeline.text import build_vocab, vocab_coverage

    df = spark.createDataFrame(
        [
            (1, "spark spark spark rare"),
            (2, "spark data data"),
            (3, "data weird"),
        ],
        "doc_id bigint, text string",
    )
    # corpus-trained: spark(4) and data(3) clear min_count=2; rare/weird OOV
    vocab = {r["term"]: r["ct"] for r in build_vocab(df, min_count=2).collect()}
    assert vocab == {"spark": 4, "data": 3}
    out = {r["doc_id"]: r for r in vocab_coverage(df, min_count=2).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 1
    assert out[1]["oov_ratio"] == 0.25
    assert out[2]["n_oov"] == 0 and out[2]["oov_ratio"] == 0.0
    assert out[3]["n_oov"] == 1 and out[3]["oov_ratio"] == 0.5
    # external vocabulary overrides corpus training
    ext = spark.createDataFrame([("rare",), ("weird",)], "term string")
    out2 = {r["doc_id"]: r for r in vocab_coverage(df, vocab=ext).collect()}
    assert out2[1]["n_oov"] == 3 and out2[3]["n_oov"] == 1


def test_importance_weights_match_python_oracle(spark):
    """Exact replication of the DSIR score in pure Python (portable
    md5 buckets), plus the semantic sanity check: documents from the
    target distribution outscore off-target ones."""
    import hashlib
    import math
    from collections import Counter

    from diseasystore_spark.pipeline.importance import importance_weights

    raw = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox naps under the warm sun"),
        (3, "einsum matmul tensor kernel fused autograd graph pass"),
        (4, "tensor kernel shapes broadcast stride layout pad crop"),
    ]
    target = [(10, "the quick brown fox runs past the sleepy dog")]
    B = 64

    def buckets(text):
        w = text.split()
        out = []
        for i in range(len(w) - 1):
            g = f"{w[i]} {w[i + 1]}"
            out.append(int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B)
        return out

    qc, pc = Counter(), Counter()
    per_doc = {}
    for d, t in raw:
        bs = buckets(t)
        per_doc[d] = Counter(bs)
        qc.update(bs)
    for _, t in target:
        pc.update(buckets(t))
    Q, T = sum(qc.values()), sum(pc.values())
    lpm = {
        b: round(
            math.log(((pc[b] + 1) / (T + B)) / ((qc[b] + 1) / (Q + B))) * 1e6
        )
        for b in qc
    }
    expected = {
        d: sum(ct * lpm[b] for b, ct in cs.items())
        for d, cs in per_doc.items()
    }

    df = spark.createDataFrame(raw, "doc_id bigint, text string")
    tgt = spark.createDataFrame(target, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r
        for r in importance_weights(
            df, tgt, num_buckets=B, portable=True
        ).collect()
    }
    for d, _ in raw:
        assert out[d]["score_micro"] == expected[d], d
        assert out[d]["n_features"] == sum(per_doc[d].values())
    # English-like docs (sharing target bigrams) beat the tensor docs
    # per feature (DSIR sums are unnormalized, so compare densities)
    def per_feat(d):
        return out[d]["score_micro"] / out[d]["n_features"]

    assert min(per_feat(1), per_feat(2)) > max(per_feat(3), per_feat(4))


def test_near_dup_groups_minhash_path(spark, docs):
    """The LSH pair method must agree with the full-corpus LSH
    component closure (same equivalence the jaccard path's q53 oracle
    checks), and auto/star/label must agree with each other."""
    from diseasystore_spark.pipeline.dedup import (
        dedup_components,
        minhash_lsh_pairs,
        near_dup_groups,
    )
    import pytest as _pytest

    corpus = docs.union(docs.withColumn("doc_id", F.col("doc_id") + 100000))
    out = {
        r["doc_id"]: r["component"]
        for r in near_dup_groups(
            corpus, threshold=0.25, pair_method="minhash", algorithm="auto"
        ).collect()
    }
    assert len(out) == corpus.count()
    # every duplicated doc lands in its original's component
    for d in range(docs.count()):
        assert out[d] == out[d + 100000] == min(out[d], d)
    # cross-check against components over the full (uncollapsed) corpus
    pairs = minhash_lsh_pairs(corpus, min_est_jaccard=0.25)
    full = {
        r["id"]: r["component"] for r in dedup_components(pairs).collect()
    }
    for i, comp in full.items():
        assert out[i] == comp
    with _pytest.raises(ValueError):
        near_dup_groups(corpus, pair_method="nope")


def test_dedup_components_auto_matches_label(spark):
    from diseasystore_spark.pipeline.dedup import dedup_components

    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    label = {
        r["id"]: r["component"]
        for r in dedup_components(df, collect_threshold=0).collect()
    }
    auto = {
        r["id"]: r["component"]
        for r in dedup_components(
            df, collect_threshold=0, algorithm="auto"
        ).collect()
    }
    assert auto == label
    assert auto[3] == 1 and auto[23] == 20 and auto[11] == 10


def test_normalize_text_golden(spark):
    from diseasystore_spark.pipeline.text import normalize_text

    df = spark.createDataFrame(
        [
            (1, "  Hello\t\tWORLD \n again  "),
            (2, "already clean"),
            (3, "ctrl\x01char and\x0bvtab"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert out[1]["text_norm"] == "hello world again"
    assert out[1]["changed"] is True
    assert out[1]["n_chars_raw"] == 24 and out[1]["n_chars_norm"] == 17
    assert out[2]["text_norm"] == "already clean" and out[2]["changed"] is False
    # \x0b collapses as whitespace; \x01 is stripped gluing its sides
    assert out[3]["text_norm"] == "ctrlchar and vtab"
    nolower = normalize_text(df, lowercase=False).collect()
    assert {r["doc_id"]: r["text_norm"] for r in nolower}[1] == "Hello WORLD again"


def test_ngram_decontaminate_exact_overlap(spark):
    from diseasystore_spark.pipeline.dedup import ngram_decontaminate

    bench = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly")],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains a verbatim 5-gram from the benchmark
            (1, "padding words the secret benchmark answer is here now"),
            # shares only 4-gram-or-shorter overlap: clean at n=5
            (2, "the secret benchmark answer differs completely after that"),
            (3, "no overlap whatsoever in this document"),
            (4, "tiny"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r
        for r in ngram_decontaminate(corpus, bench, n=5).collect()
    }
    assert len(out) == 4
    assert out[1]["contaminated"] and out[1]["n_shared_ngrams"] == 1
    assert not out[2]["contaminated"] and out[2]["n_shared_ngrams"] == 0
    assert not out[3]["contaminated"]
    assert not out[4]["contaminated"]  # < n tokens, no grams
    # at n=4 doc 2 becomes contaminated
    out4 = {
        r["doc_id"]: r["contaminated"]
        for r in ngram_decontaminate(corpus, bench, n=4).collect()
    }
    assert out4[2]


def test_mixture_weights_golden(spark):
    from diseasystore_spark.pipeline.sample import mixture_weights
    import pytest as _pytest

    df = spark.createDataFrame(
        [(i, "web" if i < 60 else ("code" if i < 90 else "wiki"))
         for i in range(100)],
        "doc_id bigint, source string",
    )
    out = {
        r["stratum"]: r
        for r in mixture_weights(
            df, {"web": 0.5, "wiki": 0.5}
        ).collect()
    }
    assert out["web"]["n_docs"] == 60 and out["web"]["actual_ppm"] == 600000
    # reshape 60% web -> 50%: weight 0.5/0.6
    assert out["web"]["weight_micro"] == round(0.5 / 0.6 * 1e6)
    # wiki upsamples 10% -> 50%: weight 5x
    assert out["wiki"]["weight_micro"] == 5000000
    # code absent from target: dropped
    assert out["code"]["weight_micro"] == 0
    with _pytest.raises(ValueError):
        mixture_weights(df, {})


def test_quality_outliers_global_and_grouped(spark):
    from diseasystore_spark.pipeline.text import quality_outliers

    rows = [(i, 10 * i, "a" if i < 8 else "b") for i in range(1, 11)]
    df = spark.createDataFrame(rows, "doc_id bigint, m bigint, g string")
    # global: p5/p95 over 10..100 flag the extremes only
    out = {
        r["doc_id"]: r["is_outlier"]
        for r in quality_outliers(
            df, metric_col="m", lo=0.05, hi=0.95
        ).collect()
    }
    assert out[1] and out[10]
    assert not any(out[i] for i in range(2, 10))
    # grouped: cuts computed within each group
    outg = {
        r["doc_id"]: r
        for r in quality_outliers(
            df, metric_col="m", group_col="g", lo=0.0, hi=0.5
        ).collect()
    }
    # group b = {90, 100}: hi cut = 95; 100 is an outlier within b
    assert outg[10]["is_outlier"] and not outg[9]["is_outlier"]


def test_select_within_budget_matches_naive_cumsum(spark):
    """The two-level prefix sum must equal the naive global cumsum
    ordered by (score desc, id), including across score ties."""
    from diseasystore_spark.pipeline.sample import select_within_budget

    rows = [
        (1, 50, 10), (2, 90, 30), (3, 90, 20), (4, 70, 40),
        (5, 90, 5), (6, 10, 100), (7, 70, 7),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, s bigint, sz bigint")
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum, expect = 0, {}
    for i, s, sz in order:
        cum += sz
        expect[i] = (cum, cum <= 100)
    got = {
        r["doc_id"]: (r["cum_size"], r["selected"])
        for r in select_within_budget(
            df, score_col="s", size_col="sz", budget=100
        ).collect()
    }
    assert got == expect


def test_select_within_budget_coarse_div_invariant(spark):
    """The coarse bucketization must not change the result — only the
    level-1/level-3 work split (including negative scores, where the
    truncating DIV buckets differently but stays monotone)."""
    from diseasystore_spark.pipeline.sample import select_within_budget

    rows = [(i, -1_000_000 - 37 * i * i % 997_000, 5 + i % 13)
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, s bigint, sz bigint")
    plain = {
        r["doc_id"]: (r["cum_size"], r["selected"])
        for r in select_within_budget(df, "s", "sz", 400).collect()
    }
    for div in (7, 100_000, 10_000_000):
        coarse = {
            r["doc_id"]: (r["cum_size"], r["selected"])
            for r in select_within_budget(
                df, "s", "sz", 400, coarse_div=div
            ).collect()
        }
        assert coarse == plain, div


def test_tokenize_to_ids_frequency_ranked(spark):
    from diseasystore_spark.pipeline.text import tokenize_to_ids

    df = spark.createDataFrame(
        [
            (1, "data data data spark spark rare"),
            (2, "spark data xx"),
        ],
        "doc_id bigint, text string",
    )
    rows = tokenize_to_ids(df, min_count=2).collect()
    ids = {r["term"]: r["term_id"] for r in rows}
    # data(4) -> id 1, spark(3) -> id 2; rare/xx below floor -> unk 0
    assert ids == {"data": 1, "spark": 2, "rare": 0, "xx": 0}
    # position ordering reconstructs the sequence
    seq1 = [
        r["term_id"]
        for r in sorted(
            (r for r in rows if r["doc_id"] == 1), key=lambda r: r["pos"]
        )
    ]
    assert seq1 == [1, 1, 1, 2, 2, 0]


def test_curation_e2e_prefix_and_budget(spark):
    """q66 composition invariants: the selected set is a rank prefix
    in (score desc, id) order, its token total respects the budget,
    and every scored doc survived both the curation and the
    decontamination stage."""
    from diseasystore_spark.queries import QUERIES, _read

    out = QUERIES["q66_curation_e2e"](spark, SF).collect()
    assert out
    ranked = sorted(out, key=lambda r: (-r["score"], r["doc_id"]))
    flags = [r["selected"] for r in ranked]
    assert flags == sorted(flags, reverse=True)  # prefix property
    assert sum(r["size"] for r in ranked if r["selected"]) <= 5000
    # scored docs are curation survivors and decontaminated
    from diseasystore_spark.pipeline.dedup import ngram_decontaminate
    from diseasystore_spark.pipeline.text import curate_corpus

    docs = _read(spark, SF, "documents")
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    kept = {
        r["doc_id"]
        for r in curate_corpus(
            corpus, min_quality=0.15, lang="en"
        ).collect()
    }
    dirty = {
        r["doc_id"]
        for r in ngram_decontaminate(
            corpus, docs.where(F.col("doc_id") % 97 == 0), n=5
        )
        .where(F.col("contaminated"))
        .collect()
    }
    scored_ids = {r["doc_id"] for r in out}
    assert scored_ids == kept - dirty


def test_embedding_outliers_golden(spark):
    from diseasystore_spark.pipeline.similarity import embedding_outliers

    rows = [
        (1, [0.0, 0.0], 0),
        (2, [2.0, 0.0], 0),   # centroid of label 0 = (1, 0)
        (3, [10.0, 10.0], 1),
        (4, [10.0, 14.0], 1),  # centroid of label 1 = (10, 12)
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = {
        r["vec_id"]: r["dist2_centroid"]
        for r in embedding_outliers(df, group_col="label").collect()
    }
    assert out == {1: 1.0, 2: 1.0, 3: 4.0, 4: 4.0}
    # ungrouped: one global centroid (5.5, 6.0)
    g = {
        r["vec_id"]: r["dist2_centroid"]
        for r in embedding_outliers(df).collect()
    }
    assert g[1] == round(5.5**2 + 6.0**2, 4)
    assert set(g) == {1, 2, 3, 4}


def test_build_mixture_proportions_and_determinism(spark):
    from diseasystore_spark.pipeline.sample import build_mixture

    rows = [(i, "a" if i < 4000 else ("b" if i < 5000 else "c"))
            for i in range(6000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # a: 4000 docs, b: 1000, c: 1000. Target 50/25/25 -> binding
    # stratum is b or c (1000/0.25 = 4000 = T); a keeps 0.5.
    out = build_mixture(df, {"a": 0.5, "b": 0.25, "c": 0.25})
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # Bernoulli-by-hash: expect ~2000/1000/1000 within ~5 sigma.
    assert abs(got["a"] - 2000) < 160
    assert got["b"] == 1000 and got["c"] == 1000  # rate 1.0: keep all
    # Deterministic: same call -> same membership.
    again = build_mixture(df, {"a": 0.5, "b": 0.25, "c": 0.25})
    assert out.select("doc_id").subtract(again.select("doc_id")).count() == 0
    assert again.select("doc_id").subtract(out.select("doc_id")).count() == 0
    # Strata outside the target are dropped entirely.
    assert out.where(~F.col("source").isin(["a", "b", "c"])).count() == 0


def test_build_mixture_validates_target(spark):
    from diseasystore_spark.pipeline.sample import build_mixture

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="at least one"):
        build_mixture(df, {})
    with pytest.raises(ValueError, match="positive"):
        build_mixture(df, {"a": 0.0, "b": 1.0})
    with pytest.raises(ValueError, match="sum to 1"):
        build_mixture(df, {"a": 0.4, "b": 0.4})


def test_contamination_fraction_counts(spark):
    from diseasystore_spark.pipeline.dedup import contamination_fraction

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f"),      # grams: abcde, bcdef (2 total)
            (2, "a b c d e x y"),    # grams: abcde, bcdex, cdexy (3)
            (3, "p q r s t"),        # 1 gram, clean
            (4, "too short"),        # 0 grams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "a b c d e")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           contamination_fraction(corpus, bench, n=5).collect()}
    assert (out[1]["n_shared_ngrams"], out[1]["n_total_ngrams"]) == (1, 2)
    assert out[1]["shared_ppm"] == 500000
    assert (out[2]["n_shared_ngrams"], out[2]["n_total_ngrams"]) == (1, 3)
    assert out[2]["shared_ppm"] == 333333
    assert (out[3]["n_shared_ngrams"], out[3]["shared_ppm"]) == (0, 0)
    assert (out[4]["n_total_ngrams"], out[4]["shared_ppm"]) == (0, 0)


def test_canonical_by_quality_picks_best(spark):
    from diseasystore_spark.pipeline.dedup import canonical_by_quality

    # Docs 1/2 are near-dups (shared trigrams); doc 2 is "cleaner"
    # under an explicit score frame. Doc 3 is a singleton.
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over a lazy dog"),
            (3, "completely different content with nothing shared here"),
        ],
        "doc_id long, text string",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5)], "doc_id long, quality_score double"
    )
    out = {r["doc_id"]: r for r in canonical_by_quality(
        docs, score_df=scores, n=3, threshold=0.3
    ).collect()}
    assert out[1]["component"] == out[2]["component"] == 1
    assert not out[1]["is_canonical"] and out[2]["is_canonical"]
    assert out[3]["is_canonical"]
    # Exactly one canonical per component.
    assert sum(1 for r in out.values() if r["is_canonical"]) == 2


def test_contamination_spans_positions(spark):
    from diseasystore_spark.pipeline.dedup import contamination_spans

    corpus = spark.createDataFrame(
        [
            # benchmark 5-gram "a b c d e" appears at word pos 2 and 8
            (1, "x y a b c d e z q a b c d e"),
            (2, "p q r s t u v"),  # clean -> absent from output
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "a b c d e")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           contamination_spans(corpus, bench, n=5).collect()}
    assert set(out) == {1}
    assert out[1]["first_pos"] == 2
    assert out[1]["n_hit_positions"] == 2


def test_curation_verdicts_version_through_scd2_store(spark, tmp_path):
    """Bridge test: batch curation survivors written as SCD2 snapshots.
    Re-curating after the corpus changes must close only the dropped
    survivors; the earlier slice still replays the original survivor
    set (bitemporal audit of WHAT the pipeline kept WHEN)."""
    import datetime as dt

    from diseasystore_spark.pipeline.text import curate_corpus
    from diseasystore_spark.storage.scd2 import ParquetFeatureStore

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    be = ParquetFeatureStore(spark, str(tmp_path / "store"))
    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)

    v1 = curate_corpus(docs).select("doc_id", "pred_lang", "quality_score")
    be.update_snapshot(v1, "curation.verdicts", t1)

    # corpus change: one surviving doc degrades to noise -> drops out
    victim = v1.orderBy("doc_id").first()["doc_id"]
    flipped = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == victim, F.lit("@@ ## 11 $$")).otherwise(
            F.col("text")
        ),
    )
    v2 = curate_corpus(flipped).select("doc_id", "pred_lang", "quality_score")
    be.update_snapshot(v2, "curation.verdicts", t2)

    s1 = {r["doc_id"] for r in be.get_table("curation.verdicts", t1).collect()}
    s2 = {r["doc_id"] for r in be.get_table("curation.verdicts", t2).collect()}
    assert s1 == {r["doc_id"] for r in v1.collect()}
    assert s2 == {r["doc_id"] for r in v2.collect()}
    assert victim in s1 and victim not in s2
    # only the dropped/changed verdict rows closed
    raw = be.read_raw("curation.verdicts")
    assert raw.where("until_ts IS NOT NULL").count() == v1.subtract(v2).count()


def test_triangle_counts_matches_bruteforce(spark):
    import itertools
    import random

    from diseasystore_spark.pipeline.dedup import triangle_counts

    rng = random.Random(13)
    nodes = list(range(14))
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(40)}
    )
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["n_triangles"]
           for r in triangle_counts(df).collect()}
    eset = set(edges)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if ((a, b) in eset and (b, c) in eset and (a, c) in eset):
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == want


def test_adamic_adar_links_scores(spark):
    import math

    from diseasystore_spark.pipeline.dedup import adamic_adar_links

    # path 1-2-3 plus hub 9 adjacent to 1,3,4: candidates include
    # (1,3) via {2, 9} and (1,4)/(3,4) via {9}; (1,2) etc. are edges.
    edges = [(1, 2), (2, 3), (9, 1), (9, 3), (9, 4)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {(r["id_a"], r["id_b"]): (r["common_neighbors"], r["score_micro"])
           for r in adamic_adar_links(df).collect()}
    w = lambda d: round(1e6 / math.log(d))  # noqa: E731
    assert out[(1, 3)] == (2, w(2) + w(3))   # neighbors 2 (deg 2), 9 (deg 3)
    assert out[(1, 4)] == (1, w(3))
    assert out[(3, 4)] == (1, w(3))
    assert (2, 9) in out  # common neighbors 1 and 3
    assert (1, 2) not in out and (9, 4) not in out  # existing edges
    # hub cap drops 9 (degree 3) as an intermediate: (1,4)/(3,4)
    # vanish; (1,3) keeps only neighbor 2; (2,9) keeps 1 and 3
    capped = {(r["id_a"], r["id_b"]): (r["common_neighbors"],
                                       r["score_micro"])
              for r in adamic_adar_links(df, max_degree=2).collect()}
    assert set(capped) == {(1, 3), (2, 9)}
    assert capped[(1, 3)] == (1, w(2))


def test_validate_contract_rules(spark):
    from diseasystore_spark.pipeline.validate import validate_contract

    df = spark.createDataFrame(
        [
            (1, 5.0, "A"),
            (1, 5.0, "A"),      # duplicate key 1
            (2, None, "B"),     # null v; B not accepted
            (3, 99.0, None),    # out of range; null status exempt
        ],
        "k long, v double, status string",
    )
    out = {r["rule"]: r["n_violations"] for r in validate_contract(
        df,
        not_null=["v"],
        ranges={"v": (0.0, 10.0)},
        accepted={"status": ["A"]},
        unique=[["k"]],
        custom={"big_v": F.col("v") > 50},
    ).collect()}
    assert out == {
        "not_null:v": 1,
        "range:v": 1,          # only 99.0; the NULL is not a range hit
        "accepted:status": 1,  # only "B"; NULL exempt
        "unique:k": 1,         # one extra row under key 1
        "custom:big_v": 1,
    }


def test_validate_contract_requires_rules(spark):
    import pytest

    from diseasystore_spark.pipeline.validate import validate_contract

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="at least one rule"):
        validate_contract(df)
    with pytest.raises(ValueError, match="at least one column"):
        validate_contract(df, unique=[[]])


def test_read_corpus_jsonl_and_csv_roundtrip(spark, tmp_path):
    import gzip
    import json as _json

    from diseasystore_spark.pipeline.io import read_corpus

    rows = [
        {"doc_id": 1, "text": "hello world", "lang": "en",
         "source": "s", "n_chars": 11},
        {"doc_id": 2, "text": "bon jour", "lang": "fr",
         "source": "s", "n_chars": 8},
    ]
    jl = tmp_path / "c.jsonl.gz"
    with gzip.open(jl, "wt") as fh:
        for r in rows:
            fh.write(_json.dumps(r) + "\n")
    got = read_corpus(spark, str(jl), format="jsonl")
    assert {(r["doc_id"], r["text"]) for r in got.collect()} == {
        (1, "hello world"), (2, "bon jour")
    }

    # no-id corpus: synthesize deterministic hash ids
    jl2 = tmp_path / "noid.jsonl"
    with open(jl2, "w") as fh:
        fh.write('{"text": "alpha"}\n{"text": "alpha"}\n{"text": "beta"}\n')
    ids = [
        r["doc_id"]
        for r in read_corpus(
            spark, str(jl2), format="jsonl", schema="text string",
            synthesize_ids=True,
        ).collect()
    ]
    assert len(set(ids)) == 2  # exact dups collapse to one id

    import pytest

    with pytest.raises(ValueError, match="no 'doc_id'"):
        read_corpus(spark, str(jl2), format="jsonl", schema="text string")
    with pytest.raises(ValueError, match="parquet/jsonl/csv"):
        read_corpus(spark, str(jl), format="orc")


def test_validate_contract_matches_python_oracle(spark):
    import random

    from diseasystore_spark.pipeline.validate import validate_contract

    rng = random.Random(99)
    rows = []
    for i in range(200):
        k = rng.randrange(150)              # some duplicate keys
        v = None if rng.random() < 0.1 else rng.uniform(-5, 15)
        s = rng.choice(["A", "B", None])
        rows.append((k, v, s))
    df = spark.createDataFrame(rows, "k long, v double, status string")
    got = {r["rule"]: r["n_violations"] for r in validate_contract(
        df,
        not_null=["v"],
        ranges={"v": (0.0, 10.0)},
        accepted={"status": ["A"]},
        unique=[["k"]],
    ).collect()}
    want = {
        "not_null:v": sum(1 for _, v, _ in rows if v is None),
        "range:v": sum(
            1 for _, v, _ in rows if v is not None and not 0.0 <= v <= 10.0
        ),
        "accepted:status": sum(
            1 for *_, s in rows if s is not None and s != "A"
        ),
        "unique:k": len(rows) - len({k for k, *_ in rows}),
    }
    assert got == want


def _planted_corpus(spark):
    """Adversarial corpus for the collapsed-graph paths: exact-dup
    cliques of several sizes, an isolated twin pair, empty and
    whitespace-only contents (no shingles -> no pairs), a singleton,
    and near-dup bridges between groups."""
    A = "the quick brown fox jumps over the lazy dog again and again"
    A2 = "the quick brown fox jumps over the lazy dog again and AGAIN"
    C = "pack my box with five dozen liquor jugs for the long trip"
    D = "pack my box with five dozen liquor jugs for the long haul"
    B = "completely unrelated content that matches nothing else here"
    rows = (
        [(i, A) for i in (1, 2, 3, 4)]      # 4-clique exact group
        + [(5, A2)]                          # near-dup bridge to A
        + [(6, B), (7, B)]                   # isolated twin pair
        + [(8, ""), (9, "")]                 # empty: exact group, 0 shingles
        + [(10, "just one singleton document standing alone right here")]
        + [(11, "   ")]                      # whitespace-only
        + [(12, C), (13, C), (14, C)]        # 3-clique group
        + [(15, D), (16, D)]                 # twin group near-dup of C
    )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_components_text_equals_direct(spark):
    from diseasystore_spark.pipeline.dedup import (
        dedup_components,
        dedup_components_text,
        jaccard_pairs,
    )

    df = _planted_corpus(spark)
    direct = {
        r["id"]: r["component"]
        for r in dedup_components(
            jaccard_pairs(df, n=3, threshold=0.2)
        ).collect()
    }
    got = {
        r["id"]: r["component"]
        for r in dedup_components_text(df, n=3, threshold=0.2).collect()
    }
    assert direct, "fixture must produce pairs"
    assert got == direct
    # empty/whitespace docs and the singleton must NOT appear
    assert not {8, 9, 10, 11} & set(got)
    # isolated twins DO appear (jaccard-1 intra-group pair)
    assert got[6] == 6 and got[7] == 6


def test_triangle_counts_text_equals_direct(spark):
    from diseasystore_spark.pipeline.dedup import (
        jaccard_pairs,
        triangle_counts,
        triangle_counts_text,
    )

    df = _planted_corpus(spark)
    direct = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(
            jaccard_pairs(df, n=3, threshold=0.2)
        ).collect()
    }
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts_text(df, n=3, threshold=0.2).collect()
    }
    assert direct, "fixture must produce triangles"
    assert got == direct


def test_collapsed_graph_paths_random_corpus(spark):
    """Seeded-random multiplicities over a tiny phrase pool: every
    near-dup relation and clique size arises by chance; both
    collapsed paths must match the direct full-pair compositions."""
    import random

    from diseasystore_spark.pipeline.dedup import (
        dedup_components,
        dedup_components_text,
        jaccard_pairs,
        triangle_counts,
        triangle_counts_text,
    )

    rng = random.Random(424)
    phrases = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",
        "alpha beta gamma delta epsilon zeta xi iota",
        "one two three four five six seven eight nine",
        "one two three four five six seven eight ten",
        "",
    ]
    rows, i = [], 0
    for p in phrases:
        for _ in range(rng.randrange(1, 5)):
            i += 1
            rows.append((i, p))
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = jaccard_pairs(df, n=3, threshold=0.3)
    assert {
        r["id"]: r["component"]
        for r in dedup_components_text(df, n=3, threshold=0.3).collect()
    } == {
        r["id"]: r["component"] for r in dedup_components(pairs).collect()
    }
    assert {
        r["node"]: r["n_triangles"]
        for r in triangle_counts_text(df, n=3, threshold=0.3).collect()
    } == {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(pairs).collect()
    }


def test_collapsed_graph_paths_max_df_equals_direct(spark):
    """Hot-shingle guard semantics: with ``max_df`` set, the collapsed
    entry paths must STILL equal the direct full-corpus compositions.
    The corpus is built so the guard only fires if shingle DF is
    weighted by exact-group size (6 identical copies of the
    boilerplate → full-corpus DF 6 > max_df 4, rep-level DF 1), and
    so a twin group's shingles are ALL dropped (post-filter survival
    must suppress its implicit Jaccard-1 intra pair)."""
    from diseasystore_spark.pipeline.dedup import (
        dedup_components,
        dedup_components_text,
        jaccard_pairs,
        triangle_counts,
        triangle_counts_text,
    )

    P = "the quick brown fox jumps"          # 3 trigrams, all hot (DF 6)
    rows = (
        [(i, P) for i in range(1, 7)]        # boilerplate-only twin group
        + [(7, "unique seven content row alpha beta gamma delta")]
        + [(8, "unique seven content row alpha beta gamma epsilon")]
        + [(9, P + " plus nine specific trailing words here")]
        + [(10, P + " plus nine specific trailing words there")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")

    for max_df in (4, None):
        pairs = jaccard_pairs(df, n=3, threshold=0.2, max_df=max_df)
        direct_c = {
            r["id"]: r["component"]
            for r in dedup_components(pairs).collect()
        }
        got_c = {
            r["id"]: r["component"]
            for r in dedup_components_text(
                df, n=3, threshold=0.2, max_df=max_df
            ).collect()
        }
        assert got_c == direct_c, f"components diverge at max_df={max_df}"
        direct_t = {
            r["node"]: r["n_triangles"]
            for r in triangle_counts(pairs).collect()
        }
        got_t = {
            r["node"]: r["n_triangles"]
            for r in triangle_counts_text(
                df, n=3, threshold=0.2, max_df=max_df
            ).collect()
        }
        assert got_t == direct_t, f"triangles diverge at max_df={max_df}"
        if max_df is None:
            # unguarded: the boilerplate group IS a component (+clique)
            assert {1, 2, 3, 4, 5, 6} <= set(got_c)
            assert got_t.get(1, 0) >= 1
        else:
            # guard fires: every shingle of group 1-6 is hot → no pairs
            assert not ({1, 2, 3, 4, 5, 6} & set(got_c))
            # near-dups whose distinguishing shingles are cold survive
            assert got_c[7] == 7 and got_c[8] == 7
            assert got_c[9] == 9 and got_c[10] == 9


def test_verify_pairs_edit_similarity_matches_python_dp(spark):
    """The verify stage (length prefilter + threshold-bounded JVM
    levenshtein) must equal a plain Python DP over ALL candidate
    pairs — the guards are performance-only, never result-changing."""
    import random

    from diseasystore_spark.pipeline.dedup import (
        verify_pairs_edit_similarity,
    )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = random.Random(3)
    alphabet = "abcd "
    texts = {}
    for i in range(30):
        base = "".join(rng.choices(alphabet, k=rng.randrange(0, 25)))
        texts[i] = base
        # near-dup twin: small edit of an earlier doc
        if i >= 15:
            src = texts[i - 15]
            pos = rng.randrange(0, len(src) + 1)
            texts[i] = src[:pos] + rng.choice(alphabet) + src[pos:]
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    cand = [(a, b) for a in range(30) for b in range(a + 1, 30)]
    pairs = spark.createDataFrame(cand, "id_a long, id_b long")

    thr = 0.6
    got = {
        (r["id_a"], r["id_b"]): r["edit_sim_micro"]
        for r in verify_pairs_edit_similarity(
            docs, pairs, min_similarity=thr
        ).collect()
    }
    want = {}
    for a, b in cand:
        ta, tb = texts[a], texts[b]
        m = max(len(ta), len(tb))
        if m == 0:
            continue
        sim = round((1.0 - lev(ta, tb) / m) * 1_000_000)
        if sim >= round(thr * 1_000_000):
            want[(a, b)] = sim
    assert want, "fixture should verify some pairs"
    assert got == want


def _encode_bmp(arr, top_down=False):
    """Test-side 24-bit BMP encoder (numpy HxWx3 RGB uint8)."""
    import struct

    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    stride = (w * 3 + 3) & ~3
    rows = arr if top_down else arr[::-1]
    body = bytearray()
    for r in range(h):
        line = rows[r][:, ::-1].astype(np.uint8).tobytes()  # RGB->BGR
        body += line + b"\x00" * (stride - len(line))
    pixel_off = 54
    size = pixel_off + len(body)
    header = b"BM" + struct.pack("<IHHI", size, 0, 0, pixel_off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, (h if not top_down else -h), 1, 24, 0,
        len(body), 2835, 2835, 0, 0,
    )
    return bytes(header + info + body)


def test_bmp_decode_roundtrip_and_image_stats(spark):
    """decode_bmp is a REAL decoder: byte-exact roundtrip through the
    test-side encoder (bottom-up AND top-down, padded widths), and the
    Spark image_stats pipeline reports exact dimensions/means with
    corrupt payloads surfaced as data, not exceptions."""
    import numpy as np

    from diseasystore_spark.pipeline.multimodal import (
        decode_bmp,
        image_stats,
    )

    rng = np.random.RandomState(7)
    img_a = rng.randint(0, 256, size=(2, 2, 3), dtype=np.uint8)
    img_b = rng.randint(0, 256, size=(3, 3, 3), dtype=np.uint8)  # padded
    assert (decode_bmp(_encode_bmp(img_a)) == img_a).all()
    assert (decode_bmp(_encode_bmp(img_b)) == img_b).all()
    assert (decode_bmp(_encode_bmp(img_b, top_down=True)) == img_b).all()

    rows = [
        (1, bytearray(_encode_bmp(img_a))),
        (2, bytearray(_encode_bmp(img_b))),
        (3, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in image_stats(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (2, 2)
    assert (got[2]["width"], got[2]["height"]) == (3, 3)
    for doc, img in ((1, img_a), (2, img_b)):
        want = img.reshape(-1, 3).mean(axis=0)
        assert np.allclose(got[doc]["mean_rgb"], want)
    # non-BMP bytes now route to the optional compressed-codec path:
    # without PIL that's a NotImplementedError, with PIL an
    # unidentified-image error — either way a data row, not a crash
    assert got[3]["width"] is None and got[3]["decode_error"]


def test_wav_decode_roundtrip_and_audio_stats(spark):
    """decode_wav is a REAL decoder: roundtrip through constructed
    RIFF bytes (16-bit stereo incl. word-aligned extra chunk, 8-bit
    mono centered per spec), integer-exact stats through Spark, and
    corrupt/unsupported payloads surfaced as data."""
    import struct

    import numpy as np

    from diseasystore_spark.pipeline.multimodal import (
        audio_stats,
        decode_wav,
    )

    def wav(samples_bytes, n_ch, bits, rate=8000, extra_chunk=False):
        fmt = struct.pack(
            "<HHIIHH", 1, n_ch, rate, rate * n_ch * bits // 8,
            n_ch * bits // 8, bits,
        )
        chunks = b"fmt " + struct.pack("<I", 16) + fmt
        if extra_chunk:  # odd-sized chunk: next chunk is word-aligned
            chunks += b"LIST" + struct.pack("<I", 3) + b"abc\x00"
        chunks += b"data" + struct.pack("<I", len(samples_bytes)) + samples_bytes
        return (
            b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        )

    st = np.array([-5, 7, 100, -32768], dtype="<i2")  # 2 stereo frames
    s16, rate = decode_wav(wav(st.tobytes(), 2, 16, extra_chunk=True))
    assert rate == 8000 and s16.shape == (2, 2)
    assert s16.ravel().tolist() == st.tolist()

    u8 = bytes([0, 128, 255])  # 8-bit unsigned -> centered signed
    s8, _ = decode_wav(wav(u8, 1, 8))
    assert s8.ravel().tolist() == [-128, 0, 127]

    rows = [
        (1, bytearray(wav(st.tobytes(), 2, 16))),
        (2, bytearray(wav(u8, 1, 8))),
        (3, bytearray(b"RIFFjunk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_stats(df).collect()}
    assert got[1]["n_frames"] == 2 and got[1]["n_channels"] == 2
    assert got[1]["sum_abs"] == 5 + 7 + 100 + 32768
    assert got[1]["peak"] == 32768
    assert got[2]["sum_abs"] == 128 + 0 + 127 and got[2]["peak"] == 128
    assert got[3]["sum_abs"] is None and got[3]["decode_error"]

    # truncated fmt chunk (declared 16 bytes, payload cut at 8): must
    # surface as a ValueError data row, never a struct.error that
    # fails the whole task
    short_fmt = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x01\x00\x40\x1f\x00\x00"
    )
    with pytest.raises(ValueError):
        decode_wav(short_fmt)
    # fmt declares 16 but only 12 bytes present before data chunk
    fmt12 = struct.pack("<HHII", 1, 1, 8000, 16000)
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 12 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", 12) + fmt12
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        decode_wav(bad)
    got2 = {
        r["doc_id"]: r
        for r in audio_stats(
            spark.createDataFrame(
                [(9, bytearray(short_fmt))], "doc_id long, payload binary"
            )
        ).collect()
    }
    assert got2[9]["sum_abs"] is None and got2[9]["decode_error"]


def test_media_stats_mixed_corpus_dispatch(spark):
    """One scan over a heterogeneous binary column: BMP rows get image
    stats, WAV rows audio stats, corrupt/unknown payloads ride along
    as ok=false data."""
    import struct

    import numpy as np

    from diseasystore_spark.pipeline.multimodal import media_stats

    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    bmp = _encode_bmp(img)
    samples = np.array([100, -200], dtype="<i2")
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 4) + samples.tobytes()
    )
    rows = [
        (1, bytearray(bmp)),
        (2, bytearray(wav)),
        (3, bytearray(b"PK\x03\x04zipfile")),        # unknown container
        (4, bytearray(b"BM\x00trunc")),              # corrupt bmp
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in media_stats(df).collect()}
    assert got[1]["format"] == "bmp" and got[1]["ok"]
    assert (got[1]["width"], got[1]["height"]) == (2, 2)
    assert got[1]["sum_abs"] is None
    assert got[2]["format"] == "wav" and got[2]["ok"]
    assert got[2]["sum_abs"] == 300 and got[2]["peak"] == 200
    assert got[2]["width"] is None
    assert not got[3]["ok"] and got[3]["decode_error"] == "unknown container"
    assert got[4]["format"] == "bmp" and not got[4]["ok"]
    assert got[4]["decode_error"]


def test_remove_boilerplate_paragraphs_exact_and_near(spark):
    """Web-crawl cleaner semantics: exact mode drops only paragraphs
    whose EXACT content spans > max_df distinct docs; near mode
    clusters templated variants via winnowing containment first, so a
    header differing per-document still counts as ONE boilerplate
    cluster. Short paragraphs are exempt; documents reassemble in
    original order with the separator preserved."""
    from diseasystore_spark.pipeline.text import (
        remove_boilerplate_paragraphs,
    )

    hdr = "subscribe to our newsletter for daily updates and offers"
    rows = []
    for i in range(6):
        rows.append(
            (
                i,
                f"{hdr} issue {i}\n\n"
                f"document body {i} discusses topic-{i} extensively today\n\n"
                "ok",
            )
        )
    # exact repeated footer in 4 docs; bodies genuinely dissimilar
    footer = "copyright example corporation all rights reserved forever"
    bodies = {
        6: "alpine meadows bloom quietly under tremendous glacier light",
        7: "quantum harpsichord melodies reverberate across velvet auditoriums",
        8: "seventeen turtles navigated bureaucratic estuaries before dawn",
        9: "mercury vapor lanterns illuminate derelict funicular stations",
    }
    for i in range(6, 10):
        rows.append((i, f"{bodies[i]}\n\n{footer}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    exact = {
        r["doc_id"]: r
        for r in remove_boilerplate_paragraphs(df, max_df=3).collect()
    }
    # the exact footer (4 docs > 3) is dropped everywhere
    assert all(footer not in exact[i]["text_clean"] for i in range(6, 10))
    assert exact[6]["n_paras_kept"] == 1 and exact[6]["n_paras"] == 2
    # per-doc header variants are each unique -> kept in exact mode
    assert hdr in exact[0]["text_clean"]
    # ordering + separator survive reassembly
    assert exact[0]["text_clean"].startswith(hdr)
    assert "\n\n" in exact[0]["text_clean"]

    near = {
        r["doc_id"]: r
        for r in remove_boilerplate_paragraphs(
            df, max_df=3, near=True, min_containment=0.5
        ).collect()
    }
    # the templated header clusters across 6 docs -> dropped
    assert all(hdr not in near[i]["text_clean"] for i in range(6))
    # the short "ok" paragraph is exempt (always kept)
    assert all(near[i]["text_clean"].endswith("ok") for i in range(6))
    # genuinely dissimilar bodies survive near mode
    assert near[6]["text_clean"] == bodies[6]
    assert all(footer not in near[i]["text_clean"] for i in range(6, 10))

    # banded-MinHash scale path: the templated header (one token out
    # of ~11 differs -> high word-shingle jaccard) clusters and drops;
    # the exact footer drops; bodies survive. (Char-level containment
    # also clusters the "document body {i}" template — word-trigram
    # jaccard between those is 0, so minhash keeps them: the two
    # similarity granularities legitimately differ there.)
    mh = {
        r["doc_id"]: r
        for r in remove_boilerplate_paragraphs(
            df,
            max_df=3,
            near=True,
            pair_method="minhash",
            min_est_jaccard=0.5,
        ).collect()
    }
    assert all(hdr not in mh[i]["text_clean"] for i in range(6))
    assert all(
        mh[i]["text_clean"]
        == f"document body {i} discusses topic-{i} extensively today\n\nok"
        for i in range(6)
    )
    assert all(mh[i]["text_clean"] == bodies[i] for i in range(6, 10))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="pair_method"):
        remove_boilerplate_paragraphs(df, near=True, pair_method="bogus")


def test_gopher_quality_filter_rules(spark):
    """Each Gopher rule (Rae et al. 2021 A1.1) trips on its crafted
    document and ONLY the intended rules trip; arithmetic is integer
    cross-multiplication (no float thresholds)."""
    from diseasystore_spark.pipeline.text import gopher_quality_filter

    filler = " ".join(f"word{i}" for i in range(30))
    good = (
        "the quick brown fox jumps over that lazy dog and runs off to "
        "be with every other woodland creature of the forest " + filler
    )
    docs = [
        (1, good),
        (2, "short text"),                       # r_words (and stopwords)
        (3, good + " ####" * 40),                # r_symbols (+alpha)
        (4, "\n".join(["• the item to be of"] * 10)),  # r_bullets
        (5, good + ("\nthe end…" * 9)),          # r_ellipsis (9 of 10 lines)
        (6, " ".join(["1234"] * 60)),            # r_alpha + r_stopwords
        (7, " ".join(["a"] * 60)),               # r_mean_len (+stopwords)
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_quality_filter(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["passed"] and all(
        out[1][c] for c in out[1].asDict() if c.startswith("r_")
    )
    assert not out[2]["r_words"] and not out[2]["passed"]
    assert not out[3]["r_symbols"]
    assert not out[4]["r_bullets"] and out[4]["r_words"]
    assert not out[5]["r_ellipsis"] and out[5]["r_words"]
    assert not out[6]["r_alpha"] and not out[6]["r_stopwords"]
    assert not out[7]["r_mean_len"]
    # every other rule on doc 7 is sane: words ok, no bullets/ellipsis
    assert out[7]["r_words"] and out[7]["r_bullets"] and out[7]["r_ellipsis"]


def test_c4_clean_rules(spark):
    """C4 rules (Raffel et al. 2020 §2.2): line filter (terminal
    punctuation incl. closing quote, >=5 words, no 'javascript') and
    doc drops (braces, lorem ipsum, badword, <3 sentences)."""
    from diseasystore_spark.pipeline.text import c4_clean

    docs = [
        (1, "This is a perfectly good first sentence here.\n"
            "And here is another one that also ends properly!\n"
            "Does this page have enough sentences now?"),
        (2, "short line.\nno terminal here\n"
            "Enable javascript to view this page now.\n"
            "This line is long enough and ends fine."),
        (3, "Some text with lorem ipsum placeholder filler in it today.\n"
            "Another fine sentence right here to count on.\n"
            "And a third one to be safe today."),
        (4, "function f() { return 1; } is code.\n"
            "A normal sentence appears right here today.\n"
            "And another full sentence closes it out."),
        (5, 'The speaker said "this ends with a quote."\n'
            "Here is another complete sentence for the count.\n"
            "And one final sentence wraps the page up."),
    ]
    out = {
        r["doc_id"]: r
        for r in c4_clean(
            spark.createDataFrame(docs, "doc_id long, text string"),
            badwords=("filler",),
        ).collect()
    }
    assert out[1]["kept"] and out[1]["n_lines_kept"] == 3
    # doc 2: 'short line.' fails word count, bare line fails terminal,
    # javascript line dropped -> 1 kept line -> 1 sentence < 3
    assert out[2]["n_lines_kept"] == 1 and not out[2]["kept"]
    assert not out[3]["kept"]  # lorem ipsum + badword
    assert not out[4]["kept"]  # curly braces
    assert out[5]["kept"]      # quote-terminated line counts
    assert out[5]["text_clean"].startswith('The speaker said "')


def test_tokenize_to_ids_bucketed_rank_identical(spark):
    """rank_buckets (two-level range rank) must produce ids identical
    to the single-window path: (ct desc, term) is a strict total
    order, so offsets + local ranks reproduce the global rank for any
    bucket boundaries. Also pins the scale shape: the vocab window is
    partition-local (no unpartitioned window over the vocab frame)."""
    from diseasystore_spark.pipeline.text import tokenize_to_ids
    from diseasystore_spark.plans.lint import plan_summary

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    plain = tokenize_to_ids(docs, min_count=2)
    bucketed = tokenize_to_ids(docs, min_count=2, rank_buckets=7)
    key = ["doc_id", "pos"]
    a = {(r["doc_id"], r["pos"]): (r["term"], r["term_id"])
         for r in plain.collect()}
    b = {(r["doc_id"], r["pos"]): (r["term"], r["term_id"])
         for r in bucketed.collect()}
    assert a == b and len(a) > 100
    # the ONLY global window left is the N-row per-partition offset
    # frame (bounded by rank_buckets); the vocab rank itself must be
    # partition-local
    assert plan_summary(bucketed)["unpartitioned_windows"] == 1
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    rank_windows = [
        ln for ln in plan.splitlines()
        if "row_number()" in ln and "Window" in ln
    ]
    assert rank_windows and all("__p" in ln for ln in rank_windows)


def test_pagerank_integer_matches_python_oracle(spark):
    """Integer PageRank on a known graph equals a pure-Python loop
    (same integral divisions), dup edges / self-loops are dropped,
    and total rank mass stays within N floor-errors of scale."""
    from diseasystore_spark.pipeline.graph import pagerank_integer

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
         ("b", "a"),            # duplicate (mirror) edge
         ("d", "d")],           # self-loop
        "src string, dst string",
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(edges, iterations=5).collect()
    }
    adj = {"a": ["b", "c"], "b": ["a", "c"], "c": ["a", "b", "d"],
           "d": ["c"]}
    scale, n = 10**12, 4
    pr = {v: scale // n for v in adj}
    for _ in range(5):
        base = (scale * 15 // 100) // n
        pr = {
            v: base
            + 85 * sum(pr[u] // len(adj[u]) for u in adj if v in adj[u])
            // 100
            for v in adj
        }
    assert got == pr
    # rank mass conservation up to floor error: each of the 5 rounds
    # loses < N units to the two integral divisions per node
    assert abs(sum(got.values()) - scale) < 5 * 4 * 100

    # The persist-keyed iteration strategy (round 12: the at-scale
    # path taken by "auto" past PAGERANK_PERSIST_EDGE_ROWS) must be
    # bit-identical to the checkpoint strategy — integer arithmetic
    # is partitioning-invariant by design.
    per = {
        r["node"]: r["rank"]
        for r in pagerank_integer(
            edges, iterations=5, iteration_strategy="persist"
        ).collect()
    }
    assert per == pr
    import pytest as _pytest

    with _pytest.raises(ValueError, match="iteration_strategy"):
        pagerank_integer(edges, iteration_strategy="bogus")


def test_pagerank_symmetric_graph_uniform(spark):
    """On a vertex-transitive graph (a cycle) every node must get the
    identical rank — any asymmetry is an ordering/partitioning leak."""
    from diseasystore_spark.pipeline.graph import pagerank_integer

    cyc = spark.createDataFrame(
        [(i, (i + 1) % 8) for i in range(8)], "src int, dst int"
    )
    ranks = {
        r["rank"] for r in pagerank_integer(cyc, iterations=4).collect()
    }
    assert len(ranks) == 1


def test_semantic_dedup_keep_first_rule(spark):
    """Crafted 3-d embeddings with an obvious 2-cluster structure:
    the higher-id near-duplicate in each cluster is evicted by the
    lower id; the orthogonal singleton survives. Portable (JVM
    argmin) and default (numpy GEMM) assignment paths must agree."""
    from diseasystore_spark.pipeline.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.9, 0.1, 0.0]),
        (4, [0.1, 0.9, 0.0]),
        (5, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    expected = {
        1: (True, None),
        2: (True, None),
        3: (False, 1),
        4: (False, 2),
        5: (True, None),
    }
    for portable in (True, False):
        out = {
            r["vec_id"]: (r["keep"], r["kept_by"])
            for r in semantic_dedup(
                df, n_clusters=2, iterations=0, threshold=0.8,
                portable=portable,
            ).collect()
        }
        assert out == expected, f"portable={portable}: {out}"


def test_rrf_fuse_matches_hand_computation(spark):
    """Two rankings, one id absent from the second (top-N-list
    semantics: it just gets no contribution), exact integer check
    against the hand-computed 1e9 DIV (k + rank) sums."""
    from diseasystore_spark.pipeline.ranking import rrf_fuse

    r1 = spark.createDataFrame(
        [(1, 30.0), (2, 20.0), (3, 10.0)], "id long, s1 double"
    )
    r2 = spark.createDataFrame([(2, 5.0), (3, 9.0)], "id long, s2 double")
    out = {
        r["id"]: (r["rrf_nano"], r["fused_rank"])
        for r in rrf_fuse(
            [(r1, "s1", False), (r2, "s2", False)], id_col="id", k=60
        ).collect()
    }
    c = lambda rank: 10**9 // (60 + rank)  # noqa: E731
    expected_scores = {
        1: c(1),           # rank 1 in r1 only
        2: c(2) + c(2),    # rank 2 in r1, rank 2 in r2
        3: c(3) + c(1),    # rank 3 in r1, rank 1 in r2
    }
    # id 3: 16129032 + 16393442 = 32522474 beats id 2's 2*16129032
    assert {k: v[0] for k, v in out.items()} == expected_scores
    assert {k: v[1] for k, v in out.items()} == {3: 1, 2: 2, 1: 3}


def test_rrf_fuse_ascending_and_groups(spark):
    """ascending=True ranks smallest-first; groups rank independently."""
    from diseasystore_spark.pipeline.ranking import rrf_fuse

    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 1.0), ("b", 3, 7.0)],
        "g string, id long, s double",
    )
    out = {
        (r["g"], r["id"]): r["fused_rank"]
        for r in rrf_fuse(
            [(df, "s", True)], id_col="id", group_cols=["g"]
        ).collect()
    }
    assert out == {("a", 2): 1, ("a", 1): 2, ("b", 3): 1}


def test_duplicate_spans_merges_overlapping_windows(spark):
    """A 6-word passage shared by two docs with n=3 yields covered
    start positions 0..3 in doc 1 (offset 2..5 in doc 2), merged into
    ONE span each; the unique tail words stay uncovered. A doc with
    an internal repeat is self-covered (min_count counts occurrences,
    not documents)."""
    from diseasystore_spark.pipeline.dedup import duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1 unique2 unique3"),
            (2, "pre1 pre2 " + shared),
            # 3-gram "x y z" occurs twice WITHIN doc 3 at starts 0 and 3
            (3, "x y z x y z"),
            (4, "totally different words here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["n_dup_grams"])
        for r in duplicate_spans(docs, n=3, min_count=2).collect()
    }
    # doc 1: starts 0,1,2,3 covered -> span words 0..5, 4 grams
    # doc 2: starts 2,3,4,5 covered -> span words 2..7, 4 grams
    # doc 3: "x y z" at 0 and 3 (and "y z x"/"z x y" occur once each,
    # but starts 0 and 3 have gap 3 == n -> merged into one span 0..5)
    assert out == {
        (1, 0): (5, 4),
        (2, 2): (7, 4),
        (3, 0): (5, 2),
    }


def test_excise_duplicate_spans_semantics(spark):
    """Excision removes exactly the covered words: shared-passage docs
    lose the passage and keep their unique tails; an exact-duplicate
    pair (fully covered) comes back empty with everything counted;
    span-free docs pass through verbatim with n_removed = 0."""
    from diseasystore_spark.pipeline.dedup import excise_duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1 unique2 unique3"),
            (2, "pre1 pre2 " + shared),
            (3, "one two three four five six seven"),  # no dups
            (4, "copy of this exact doc right here"),
            (5, "copy of this exact doc right here"),  # exact dup of 4
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in excise_duplicate_spans(docs, n=3, min_count=2).collect()
    }
    assert out[1] == ("unique1 unique2 unique3", 6)
    assert out[2] == ("pre1 pre2", 6)
    assert out[3] == ("one two three four five six seven", 0)
    assert out[4] == ("", 7)
    assert out[5] == ("", 7)


def test_distribution_drift_psi_identical_and_shifted(spark):
    """PSI of a distribution against itself is ~0 (only smoothing
    noise); a location-shifted sample scores large; shares sum to 1
    on both sides; a bin the current sample misses contributes a
    finite term (smoothing); validation raises."""
    import math

    import pytest

    from diseasystore_spark.pipeline.validate import distribution_drift_psi

    ref = spark.range(1000).selectExpr("cast(id % 100 as double) AS v")
    same = distribution_drift_psi(ref, ref, "v", n_bins=5).collect()
    assert len(same) == 5
    assert abs(sum(r["psi_term"] for r in same)) < 1e-9
    assert abs(sum(r["ref_share"] for r in same) - 1.0) < 1e-9
    assert abs(sum(r["cur_share"] for r in same) - 1.0) < 1e-9

    shifted = spark.range(1000).selectExpr(
        "cast(id % 100 + 90 as double) AS v"
    )
    drift = distribution_drift_psi(ref, shifted, "v", n_bins=5).collect()
    psi = sum(r["psi_term"] for r in drift)
    assert psi > 0.25  # population break per the standard thresholds
    assert all(math.isfinite(r["psi_term"]) for r in drift)
    # the shifted sample misses the lowest reference bins entirely
    assert any(r["cur_n"] == 0 and r["psi_term"] > 0 for r in drift)

    with pytest.raises(ValueError, match="n_bins"):
        distribution_drift_psi(ref, ref, "v", n_bins=1)
    with pytest.raises(ValueError, match="smoothing"):
        distribution_drift_psi(ref, ref, "v", smoothing=0)


def test_corpus_ngram_diversity_degenerate_vs_diverse(spark):
    """A looping corpus slice scores a far lower distinct ratio than
    a diverse one at every order; totals match hand counts; orders
    with no grams (docs shorter than n) drop the group row."""
    import pytest

    from diseasystore_spark.pipeline.text import corpus_ngram_diversity

    rows = [("loop", "a b a b a b a b"), ("loop", "a b a b")]
    rows += [("div", "q w e r t y u i"), ("div", "z x c v b n m k")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r["source"], r["n"]): r
        for r in corpus_ngram_diversity(df, group_col="source").collect()
    }
    # loop slice: 12 unigrams, 2 distinct
    assert out[("loop", 1)]["total_ngrams"] == 12
    assert out[("loop", 1)]["distinct_ngrams"] == 2
    # bigrams: 7 + 3 occurrences, {a b, b a} distinct
    assert out[("loop", 2)]["total_ngrams"] == 10
    assert out[("loop", 2)]["distinct_ngrams"] == 2
    # diverse slice: every gram unique
    for n in (1, 2, 3):
        r = out[("div", n)]
        assert r["distinct_ngrams"] == r["total_ngrams"]
        assert r["distinct_ratio"] == 1.0
    assert out[("loop", 3)]["distinct_ratio"] < 0.3

    with pytest.raises(ValueError, match="at least one"):
        corpus_ngram_diversity(df, ns=())


def test_degree_matched_negatives_contract(spark):
    """Every emitted negative: (1) shares the positive destination's
    log2-degree bucket, (2) is not a real (undirected) edge, (3) is
    not the source itself, (4) is a pure function of (edges, salt) —
    and a different salt yields a different draw somewhere."""
    import math

    from diseasystore_spark.pipeline.graph import degree_matched_negatives

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (5, 6), (7, 8), (9, 10),
         (1, 5), (2, 6), (3, 7), (4, 9), (6, 10)],
        "src bigint, dst bigint",
    )
    e = {(r["src"], r["dst"]) for r in edges.collect()}
    und = e | {(b, a) for a, b in e}
    deg: dict[int, int] = {}
    for a, _b in und:
        deg[a] = deg.get(a, 0) + 1

    out = degree_matched_negatives(edges).collect()
    assert out, "no negatives emitted"
    for r in out:
        assert (r["src"], r["pos_dst"]) in e
        assert (r["src"], r["neg_dst"]) not in und
        assert r["neg_dst"] != r["src"]
        assert r["degree_bucket"] == int(math.floor(math.log2(deg[r["pos_dst"]])))
        assert int(math.floor(math.log2(deg[r["neg_dst"]]))) == r["degree_bucket"]

    again = degree_matched_negatives(edges).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = degree_matched_negatives(edges, salt="neg1").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))

    # The canonical fast path (round 12: no undirected distinct
    # shuffle, map-side-combined degrees, anti-join on the canonical
    # half) must be row-identical to the general path on an input
    # that satisfies its contract (distinct, src < dst, no
    # self-loops) — this edge set is exactly that.
    fast = degree_matched_negatives(edges, edges_canonical=True).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, fast))


def test_annotator_agreement_known_values(spark):
    """Hand-computed 2x2 kappa; perfect agreement = 1 (including the
    single-label 0/0 convention); NULL-labeled rows excluded."""
    from diseasystore_spark.pipeline.validate import annotator_agreement

    # confusion: yes/yes 20, yes/no 5, no/yes 10, no/no 15
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
        + [(None, "y"), ("y", None)]
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = annotator_agreement(df, "a", "b").collect()[0]
    assert r["n"] == 50
    po = 35 / 50
    pe = (25 * 30 + 25 * 20) / 50**2
    assert abs(r["observed_agreement"] - po) < 1e-12
    assert abs(r["expected_agreement"] - pe) < 1e-12
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-12

    same = spark.createDataFrame([("x", "x")] * 9, "a string, b string")
    r2 = annotator_agreement(same, "a", "b").collect()[0]
    assert r2["kappa"] == 1.0  # pe == 1 convention


def test_bradley_terry_orders_strengths_correctly(spark):
    """A dominant item ends strongest, a never-winner clamps to the
    floor, a balanced pair ties exactly, and the fit is deterministic."""
    from diseasystore_spark.pipeline.ranking import bradley_terry_integer

    rows = (
        [("A", "B")] * 8 + [("B", "A")] * 2   # A >> B
        + [("B", "C")] * 9 + [("C", "B")] * 1  # B >> C
        + [("A", "C")] * 10                    # C never beats A
        + [("D", "E")] * 5 + [("E", "D")] * 5  # balanced pair
    )
    df = spark.createDataFrame(rows, "winner string, loser string")
    out = {r["item"]: r for r in bradley_terry_integer(df).collect()}
    assert set(out) == {"A", "B", "C", "D", "E"}
    assert out["A"]["strength"] > out["B"]["strength"] > out["C"]["strength"]
    assert out["D"]["strength"] == out["E"]["strength"]
    assert out["A"]["games"] == 20 and out["A"]["wins"] == 18
    again = {r["item"]: r["strength"] for r in bradley_terry_integer(df).collect()}
    assert again == {k: v["strength"] for k, v in out.items()}

    solo_loss = spark.createDataFrame(
        [("W", "L")] * 3, "winner string, loser string"
    )
    o2 = {r["item"]: r for r in bradley_terry_integer(solo_loss).collect()}
    assert o2["L"]["strength"] == 1  # clamped floor, not div-by-zero
    assert o2["W"]["strength"] > o2["L"]["strength"]

    import pytest

    with pytest.raises(ValueError, match="iterations"):
        bradley_terry_integer(df, iterations=0)


def test_distribution_drift_psi_emits_doubly_empty_bins(spark):
    """Degenerate reference (all values equal → every quantile
    boundary duplicated) leaves middle buckets unreachable by BOTH
    samples; the bin spine still emits all n_bins rows, with the
    smoothed shares summing to exactly 1 on each side (the documented
    contract the pre-spine full-outer join violated)."""
    import math

    from diseasystore_spark.pipeline.validate import distribution_drift_psi

    ref = spark.range(200).selectExpr("cast(5.0 as double) AS v")
    cur = spark.range(100).selectExpr("cast(7.0 as double) AS v")
    out = sorted(
        distribution_drift_psi(ref, cur, "v", n_bins=5).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["bin"] for r in out] == [0, 1, 2, 3, 4]
    assert any(r["ref_n"] == 0 and r["cur_n"] == 0 for r in out)
    assert abs(sum(r["ref_share"] for r in out) - 1.0) < 1e-12
    assert abs(sum(r["cur_share"] for r in out) - 1.0) < 1e-12
    assert all(math.isfinite(r["psi_term"]) for r in out)


def test_decode_image_any_real_codec_or_honest_fallback(spark):
    """8-bit truecolor PNG decodes FOR REAL in every environment via
    the stdlib decoder (zlib + numpy unfiltering): an encode_png
    round-trip through decode_image_any and the unchanged image_stats
    operator. PNG VARIANTS beyond the stdlib subset (16-bit, palette,
    Adam7) route to PIL when importable and raise the honest
    NotImplementedError otherwise. If PIL is present, cross-check the
    stdlib decoder against it on the same bytes. BMP behavior is
    identical in both environments — the q96 oracle never moves."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from diseasystore_spark.pipeline import multimodal as mm

    arr = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    payload = mm.encode_png(arr)
    assert (mm.decode_image_any(payload) == arr).all()
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    r = mm.image_stats(df).collect()[0]
    assert (r["width"], r["height"]) == (3, 3)
    assert r["decode_error"] is None
    if mm._HAS_PIL:
        import io

        from PIL import Image

        assert (
            np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
            == mm.decode_image_any(payload)
        ).all()

    # a VALID 16-bit PNG (correct CRCs) is outside the stdlib subset
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    deep = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 7))
        + chunk(b"IEND", b"")
    )
    if mm._HAS_PIL:
        assert mm.decode_image_any(deep).shape == (1, 1, 3)
    else:
        with pytest.raises(NotImplementedError, match="PNG"):
            mm.decode_image_any(deep)


def test_png_codec_roundtrip_filters_and_corruption(spark):
    """The stdlib PNG codec: every encode filter type (the encoder
    cycles y % 5 through all five) inverts exactly for RGB and RGBA
    (alpha dropped); corrupt payloads — flipped IDAT byte (CRC),
    truncated stream, non-PNG bytes — raise ValueError and surface as
    decode_error DATA rows through image_stats, never job failures."""
    import numpy as np
    import pytest

    from diseasystore_spark.pipeline import multimodal as mm

    rng = np.random.default_rng(17)
    for shape in [(16, 24, 3), (11, 7, 4), (1, 1, 3), (6, 2, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = mm.decode_png(mm.encode_png(img))
        assert out.shape == (shape[0], shape[1], 3)
        assert (out == img[:, :, :3]).all()

    good = mm.encode_png(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    flipped = bytearray(good)
    flipped[60] ^= 0xFF
    for bad in (bytes(flipped), good[:25], b"not a png at all"):
        with pytest.raises(ValueError):
            mm.decode_png(bad)
    rows = [(1, bytearray(good)), (2, bytearray(flipped))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mm.image_stats(df).collect()}
    assert got[1]["decode_error"] is None and got[1]["width"] == 8
    assert got[2]["decode_error"] and got[2]["width"] is None

    # exact channel means: the q180 analytic-oracle contract locally
    k = 21
    w, h = 8 + k % 17, 8 + k % 13
    y, x, c = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(3), indexing="ij"
    )
    img = ((7 * k + 13 * x + 31 * y + 97 * c) % 256).astype(np.uint8)
    rgb = mm.decode_png(mm.encode_png(img))
    assert (rgb == img).all()
    with pytest.raises(ValueError, match="H x W"):
        mm.encode_png(np.zeros((3, 3), dtype=np.uint8))


def test_resize_image_nearest_neighbor_exact(spark):
    """resize_image: decode -> integer NN resample -> re-encode PNG,
    verified pixel-exact against the numpy mapping for both down-
    and up-scaling; corrupt payloads quarantine with NULL payload."""
    import numpy as np
    import pytest

    from diseasystore_spark.pipeline import multimodal as mm

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(mm.encode_png(img))),
        (2, bytearray(b"corrupt bytes not a png")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    for tw, th in [(7, 5), (28, 20)]:  # down- and up-scale
        got = {
            r["doc_id"]: r
            for r in mm.resize_image(df, width=tw, height=th).collect()
        }
        xs = (np.arange(tw) * 14) // tw
        ys = (np.arange(th) * 10) // th
        want = img[np.ix_(ys, xs)]
        out = mm.decode_png(bytes(got[1]["payload"]))
        assert out.shape == (th, tw, 3)
        assert (out == want).all()
        assert got[2]["payload"] is None and got[2]["decode_error"]
    with pytest.raises(ValueError, match="positive"):
        mm.resize_image(df, width=0, height=5)


def test_y4m_video_roundtrip_and_frame_sampling(spark):
    """Y4M codec: encode/decode round-trips frames bit-exactly;
    video_frame_stats samples floor(i*n/k) frames with numpy-exact
    mean luma; corrupt payloads quarantine as ONE data row; chroma
    formats beyond Cmono raise the honest NotImplementedError."""
    import numpy as np
    import pytest

    from diseasystore_spark.pipeline import multimodal as mm

    rng = np.random.default_rng(37)
    frames = rng.integers(0, 256, size=(6, 5, 9), dtype=np.uint8)
    payload = mm.encode_y4m(frames, fps=(30, 1))
    out, fps = mm.decode_y4m(payload)
    assert fps == (30, 1) and (out == frames).all()

    rows = [(1, bytearray(payload)), (2, bytearray(payload[:-10]))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = mm.video_frame_stats(df, n_sample=4).collect()

    # media_stats dispatches y4m into the unified row shape
    med = {r["doc_id"]: r for r in mm.media_stats(df).collect()}
    assert med[1]["format"] == "y4m" and med[1]["ok"]
    assert (med[1]["width"], med[1]["height"], med[1]["n_frames"]) == (9, 5, 6)
    assert med[2]["format"] == "y4m" and not med[2]["ok"]
    assert med[2]["decode_error"]
    ok = sorted(
        (r["frame_idx"], r["mean_luma"]) for r in got if r["doc_id"] == 1
    )
    want = [
        ((i * 6) // 4, float(frames[(i * 6) // 4].mean())) for i in range(4)
    ]
    assert ok == sorted(want)
    bad = [r for r in got if r["doc_id"] == 2]
    assert len(bad) == 1 and bad[0]["decode_error"]
    with pytest.raises(NotImplementedError, match="Cmono"):
        mm.decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C420\nFRAME\n" + b"\x00" * 6)
    with pytest.raises(ValueError, match="n_frames x H x W"):
        mm.encode_y4m(np.zeros((2, 2), dtype=np.uint8))


def test_resample_audio_block_mean_exact(spark):
    """resample_audio: decode -> block-mean decimation (floor of
    block sum / factor — numpy // IS floor, negative samples
    included) -> re-encode PCM WAV at rate/factor, verified sample-
    exact against numpy on a signed waveform; stereo preserved;
    trailing partial block dropped; corrupt payloads quarantine;
    encode_wav clips to int16."""
    import numpy as np
    import pytest

    from diseasystore_spark.pipeline import multimodal as mm

    rng = np.random.default_rng(29)
    stereo = rng.integers(-30000, 30000, size=(23, 2))  # 23 % 4 != 0
    rows = [
        (1, bytearray(mm.encode_wav(stereo, 8000))),
        (2, bytearray(b"RIFFgarbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r for r in mm.resample_audio(df, factor=4).collect()
    }
    out, rate = mm.decode_wav(bytes(got[1]["payload"]))
    want = stereo[:20].reshape(5, 4, 2).sum(axis=1) // 4
    assert rate == 2000 and got[1]["sample_rate"] == 2000
    assert got[1]["n_frames"] == 5 and out.shape == (5, 2)
    assert (out == want).all()
    assert got[2]["payload"] is None and got[2]["decode_error"]
    with pytest.raises(ValueError, match="factor"):
        mm.resample_audio(df, factor=0)
    # encode_wav saturating clip
    clipped, _ = mm.decode_wav(
        mm.encode_wav(np.array([[40000, -40000]]), 8000)
    )
    assert (clipped == [[32767, -32768]]).all()


def test_decode_audio_any_real_codec_or_honest_fallback(spark):
    """Audio twin: with soundfile importable, a FLAC written BY
    soundfile round-trips through decode_audio_any / audio_stats;
    without it, compressed magics raise NotImplementedError. PCM WAV
    always takes the dependency-free decoder (q97 oracle fixed)."""
    import numpy as np
    import pytest

    from diseasystore_spark.pipeline import multimodal as mm

    if mm._HAS_SOUNDFILE:
        import io

        import soundfile as sf

        pcm = np.array([100, -200, 300, -400], dtype=np.int16)
        buf = io.BytesIO()
        sf.write(buf, pcm, 8000, format="FLAC")
        samples, rate = mm.decode_audio_any(buf.getvalue())
        assert rate == 8000
        assert samples.shape == (4, 1)
        assert (samples[:, 0] == pcm).all()
    else:
        with pytest.raises(NotImplementedError, match="soundfile"):
            mm.decode_audio_any(b"fLaC" + b"\x00" * 16)


def test_media_stats_tags_compressed_containers(spark):
    """media_stats sniffs compressed magics into their format tag:
    the row is a real decode when the codec lib is present, an honest
    NotImplementedError data row when it is not — never 'unknown
    container', never a crash. Raw bytes stay 'unknown container'."""
    from diseasystore_spark.pipeline import multimodal as mm

    rows = [
        (1, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)),
        (2, bytearray(b"fLaC" + b"\x00" * 16)),
        (3, bytearray(b"just some text")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mm.media_stats(df).collect()}
    assert got[1]["format"] == "png"
    assert got[2]["format"] == "flac"
    assert got[3]["format"] is None
    assert got[3]["decode_error"] == "unknown container"
    # truncated/garbage compressed payloads are data rows either way
    assert not got[1]["ok"] and got[1]["decode_error"]
    assert not got[2]["ok"] and got[2]["decode_error"]


def test_krippendorff_alpha_matches_fraction_oracle(spark):
    """Nominal-metric alpha against an exact-fraction Python
    implementation on a multi-rater frame with missing ratings;
    single-rating units excluded; all-agree frame returns 1.0."""
    from collections import Counter
    from fractions import Fraction

    from diseasystore_spark.pipeline.validate import krippendorff_alpha

    data = {
        1: {"A": 1, "B": 1}, 2: {"A": 2, "B": 2},
        3: {"A": 3, "B": 3, "C": 3}, 4: {"A": 3, "B": 3, "C": 3},
        5: {"A": 2, "B": 2, "C": 2}, 6: {"A": 1, "B": 2, "C": 3},
        7: {"A": 4, "B": 4, "C": 4}, 8: {"A": 1, "B": 1, "C": 2},
        9: {"A": 2, "B": 2, "C": 2}, 10: {"B": 5, "C": 5},
        11: {"B": 1, "C": 1}, 12: {"C": 3},  # unit 12: single rating
    }
    rows = [
        (u, r, l) for u, rl in data.items() for r, l in rl.items()
    ]
    df = spark.createDataFrame(rows, "unit int, rater string, label int")
    got = krippendorff_alpha(df, "unit", "rater", "label").collect()[0]

    o, n_c = Counter(), Counter()
    n_units = 0
    for _u, rl in data.items():
        labels = list(rl.values())
        m = len(labels)
        if m < 2:
            continue
        n_units += 1
        cnt = Counter(labels)
        for c in cnt:
            n_c[c] += cnt[c]
            for k in cnt:
                pairs = cnt[c] * cnt[k] - (cnt[c] if c == k else 0)
                o[(c, k)] += Fraction(pairs, m - 1)
    n = sum(n_c.values())
    do_off = sum(v for (c, k), v in o.items() if c != k)
    de = n * n - sum(v * v for v in n_c.values())
    want = 1 - Fraction(n - 1, 1) * do_off / de
    assert got["n_units"] == n_units and got["n_ratings"] == n
    assert abs(got["alpha"] - float(want)) < 1e-9

    agree = spark.createDataFrame(
        [(1, "A", "x"), (1, "B", "x"), (2, "A", "x"), (2, "B", "x")],
        "unit int, rater string, label string",
    )
    assert krippendorff_alpha(
        agree, "unit", "rater", "label"
    ).collect()[0]["alpha"] == 1.0


def test_source_overlap_matrix_matches_set_oracle(spark):
    """Shared-gram counts and Jaccard against Python set math; the
    sources-per-gram cap drops only the everywhere-grams."""
    from diseasystore_spark.pipeline.dedup import source_overlap_matrix

    rows = [
        ("s1", "a b c d e f"),     # grams(3): abc bcd cde def
        ("s2", "a b c d x y"),     # shares: abc bcd
        ("s3", "q w e r t y"),     # disjoint
        ("s1", "a b c z z z"),     # adds abc again (distinct), bcz czz zzz
    ]
    df = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(df, n=3).collect()
    }

    def grams(txts):
        g = set()
        for t in txts:
            w = t.split()
            g |= {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        return g

    g1 = grams([rows[0][1], rows[3][1]])
    g2 = grams([rows[1][1]])
    shared = g1 & g2
    assert out[("s1", "s2")]["n_shared"] == len(shared)
    assert out[("s1", "s2")]["n_a"] == len(g1)
    assert out[("s1", "s2")]["n_b"] == len(g2)
    assert out[("s1", "s2")]["jaccard"] == len(shared) / len(g1 | g2)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out

    capped = source_overlap_matrix(df, n=3, max_sources_per_gram=1)
    assert capped.count() == 0  # every shared gram exceeds the cap


def test_source_overlap_minhash_estimates_exact_jaccard(spark):
    """The MinHash scale path: signature-component match fraction
    against a Python replay of the portable double-hash family
    (exact), and against the exact operator's Jaccard (statistical,
    ±3σ at 128 hashes) on a corpus with a planted ~50% overlap;
    duplicate grams must not perturb the signature (min of a multiset
    = min of its set); validation raises."""
    import hashlib

    import pytest

    from diseasystore_spark.pipeline.dedup import (
        source_overlap_matrix,
        source_overlap_minhash,
    )

    words = [f"w{i:03d}" for i in range(120)]
    # s1: windows over words[0:80]; s2: words[40:120] -> gram overlap
    # around (80-40-2)/(120-... ) ~ 1/3; s2 repeats a doc (multiset)
    s1 = " ".join(words[:80])
    s2 = " ".join(words[40:])
    df = spark.createDataFrame(
        [(0, "s1", s1), (1, "s2", s2), (2, "s2", s2)],
        "doc_id long, source string, text string",
    )
    k = 128
    got = source_overlap_minhash(df, n=3, num_hashes=k).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["source_a"], r["source_b"], r["num_hashes"]) == ("s1", "s2", k)

    # exact Python replay of the portable signature family
    P = 2147483647

    def sig(text):
        w = text.split()
        grams = {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        mins = [P] * k
        for g in grams:
            h = hashlib.md5(g.encode()).hexdigest()
            a, b = int(h[:8], 16) % P, int(h[8:16], 16) % P
            for i in range(k):
                v = (a + i * b) % P
                if v < mins[i]:
                    mins[i] = v
        return mins
    want = sum(x == y for x, y in zip(sig(s1), sig(s2)))
    assert r["n_matches"] == want
    assert r["jaccard_est"] == want / k

    exact = source_overlap_matrix(df, n=3).collect()[0]["jaccard"]
    sigma = (exact * (1 - exact) / k) ** 0.5
    assert abs(r["jaccard_est"] - exact) <= 3 * sigma + 1e-9

    with pytest.raises(ValueError, match="num_hashes"):
        source_overlap_minhash(df, num_hashes=0)


def test_group_centroid_cosine_matches_numpy(spark):
    """Centroid cosines against numpy means on random clustered
    vectors (micro-quantized the same way); zero-vector group yields
    NULL."""
    import random as _random

    import numpy as np

    from diseasystore_spark.pipeline.similarity import group_centroid_cosine

    rng = _random.Random(41)
    base = {0: [1.0, 0.0, 0.0], 1: [0.6, 0.8, 0.0], 2: [0.0, 0.0, 1.0]}
    rows = []
    for g, center in base.items():
        for _ in range(30):
            rows.append(
                (g, [c + 0.05 * (rng.random() - 0.5) for c in center])
            )
    rows.append((9, [0.0, 0.0, 0.0]))  # zero-norm group
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    got = {
        (r["group_a"], r["group_b"]): r
        for r in group_centroid_cosine(df).collect()
    }
    sums = {}
    for g, v in rows:
        q = np.array([round(x * 1_000_000) for x in v], dtype=object)
        sums[g] = sums.get(g, np.zeros(3, dtype=object)) + q
    for (a, b), r in got.items():
        sa, sb = sums[a], sums[b]
        naa, nbb = int(sa @ sa), int(sb @ sb)
        if naa == 0 or nbb == 0:
            assert r["cos"] is None
            continue
        want = int(sa @ sb) / (naa ** 0.5 * nbb ** 0.5)
        assert abs(r["cos"] - want) < 1e-12
    assert (0, 9) in got and got[(0, 9)]["cos"] is None


def test_zipf_fit_recovers_planted_slope(spark):
    """A corpus built with an exact power-law spectrum recovers its
    planted slope; a uniform spectrum fits ~0; degenerate one-term
    vocab yields NULL slope."""
    import pytest

    from diseasystore_spark.pipeline.text import zipf_fit

    # counts = floor(1000 * rank^-1): slope -1 up to flooring
    words = []
    for rk in range(1, 60):
        words += [f"w{rk:03d}"] * max(1, int(1000 / rk))
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    r = zipf_fit(df).collect()[0]
    assert r["n_terms"] == 59
    assert r["slope"] == pytest.approx(-1.0, abs=0.05)

    uniform = spark.createDataFrame(
        [(1, " ".join(3 * [" ".join(f"u{i}" for i in range(50))]))],
        "doc_id long, text string",
    )
    ru = zipf_fit(uniform).collect()[0]
    assert abs(ru["slope"]) < 0.05

    single = spark.createDataFrame(
        [(1, "same same same")], "doc_id long, text string"
    )
    assert zipf_fit(single).collect()[0]["slope"] is None


def test_gopher_repetition_filter_hand_counts(spark):
    """Crafted docs with hand-computed repetition stats (the q193
    operator): excess-occurrence duplication for lines/paragraphs,
    most-char-covering top n-gram, duplicated n-gram chars, floored
    micro fractions with NULL on zero denominators, and 0/0
    passing."""
    from diseasystore_spark.pipeline.text import gopher_repetition_filter

    df = spark.createDataFrame(
        [
            # 3 lines ("a b" x2, "c d"), 11 chars
            (1, "a b\na b\nc d"),
            # paragraphs ["p q r" x2, "x"], lines likewise 3 (blank
            # lines dropped), 15 chars
            (2, "p q r\n\np q r\n\nx"),
            # degenerate repetition: "w w" 2-gram occurs 5x ->
            # 15 chars of an 11-char doc (fraction > 1 by the
            # documented overlapping convention)
            (3, "w w w w w w"),
            (4, ""),       # empty: zero denominators -> NULLs, passes
            (5, None),     # NULL text excluded entirely
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in gopher_repetition_filter(df).collect()
    }
    assert set(rows) == {1, 2, 3, 4}

    d1 = rows[1]
    assert d1["n_lines"] == 3 and d1["dup_line_frac_micro"] == 333333
    assert d1["dup_line_char_frac_micro"] == 272727  # 3 of 11 chars
    assert d1["top_2gram_char_frac_micro"] == 545454  # "a b" 2x3=6/11
    assert d1["r_dup_line_frac"] is False and d1["passed"] is False

    d2 = rows[2]
    assert d2["n_paras"] == 3 and d2["dup_para_frac_micro"] == 333333
    assert d2["dup_para_char_frac_micro"] == 333333  # 5 of 15 chars
    assert d2["top_2gram_char_frac_micro"] == 400000  # "p q" 2x3=6/15

    d3 = rows[3]
    assert d3["dup_line_frac_micro"] == 0
    assert d3["top_2gram_char_frac_micro"] == 1363636  # 5x3=15/11 > 1
    assert d3["dup_5gram_char_frac_micro"] == 818181   # (2-1)x9/11
    assert d3["passed"] is False

    d4 = rows[4]
    assert d4["n_lines"] == 0 and d4["dup_line_frac_micro"] is None
    assert d4["passed"] is True

    import pytest as _pytest

    with _pytest.raises(ValueError, match="top_ngram_char_pcts"):
        gopher_repetition_filter(df, top_ngram_char_pcts=(20, 18))


def test_resolve_n_clusters_auto_sqrt(spark, emb):
    """n_clusters="auto" resolves to round(sqrt(N)) clamped to
    [2, N] (the measured U-shape optimum of assignment O(N*k) vs
    pair join O(N^2/k)), and the auto run is IDENTICAL to the same
    explicit k — resolution happens before any plan is built."""
    from diseasystore_spark.pipeline.similarity import (
        resolve_n_clusters,
        semantic_dedup,
    )

    n = emb.count()
    k = resolve_n_clusters(emb, "auto")
    assert k == max(2, min(n, int(round(n**0.5))))
    assert resolve_n_clusters(emb, 7) == 7

    auto = {
        tuple(r)
        for r in semantic_dedup(
            emb, n_clusters="auto", iterations=0, portable=True
        ).collect()
    }
    explicit = {
        tuple(r)
        for r in semantic_dedup(
            emb, n_clusters=k, iterations=0, portable=True
        ).collect()
    }
    assert auto == explicit and auto

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_clusters"):
        resolve_n_clusters(emb, "sqrt")
    with _pytest.raises(ValueError, match="n_clusters"):
        resolve_n_clusters(emb, 0)
