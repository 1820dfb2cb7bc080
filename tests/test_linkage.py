"""Entity resolution (pipeline/linkage.py): blocking recall,
bounded-edit verify, cluster assignment, singleton fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diseasystore_spark.pipeline.linkage import (
    blocking_pairs,
    resolve_entities,
)


def _recs(spark, rows):
    return spark.createDataFrame(rows, "rid bigint, name string")


def test_resolve_entities_clusters_and_singletons(spark):
    """A deletion and a substitution of the same base name cluster
    with it (transitively, even when the two variants are >max_edit
    apart from each other); an unrelated record stays a singleton
    with itself as entity and n_members=1."""
    df = _recs(
        spark,
        [
            (1, "golden lavender spring"),
            (2, "goldn lavender spring"),  # deletion (dist 1 to #1)
            (3, "golden lavender sprxng"),  # substitution (dist 1 to #1)
            (9, "chocolate midnight lace"),
        ],
    )
    out = {r["record_id"]: r for r in resolve_entities(df, "rid", "name").collect()}
    assert out[1]["entity_id"] == 1
    assert out[2]["entity_id"] == 1
    assert out[3]["entity_id"] == 1
    assert out[1]["n_members"] == 3
    assert out[9]["entity_id"] == 9
    assert out[9]["n_members"] == 1


def test_blocking_catches_typo_at_either_end(spark):
    """A typo inside the PREFIX key still pairs via the suffix key
    and vice versa — the multi-pass blocking property."""
    df = _recs(
        spark,
        [
            (1, "abcdefghij"),
            (2, "Xbcdefghij"),  # first char wrong: prefix blocks differ
            (3, "abcdefghiX"),  # last char wrong: suffix blocks differ
        ],
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in blocking_pairs(df, "rid", "name").collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) in pairs

    out = {r["record_id"]: r["entity_id"] for r in resolve_entities(df, "rid", "name", max_edit=1).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_max_edit_bound_is_strict(spark):
    """Names 3 edits apart share blocks but must NOT link at
    max_edit=2 (the early-exit levenshtein returns -1 above the
    threshold — the predicate keeps only 0..max_edit)."""
    df = _recs(
        spark,
        [(1, "abcd mnop wxyz"), (2, "abcd mXYZ wxyz"), (3, "abcd mnoq wxyz")],
    )
    out = resolve_entities(df, "rid", "name", max_edit=2)
    got = {r["record_id"]: r["entity_id"] for r in out.collect()}
    # 1<->2 dist 3: unlinked; 1<->3 dist 1: linked; 2<->3 dist 4.
    assert got[1] == 1 and got[3] == 1
    assert got[2] == 2


def test_max_block_guard_drops_hot_block_only(spark):
    """max_block drops the quadratic block; pairs that also meet on
    a cold key survive. Case sensitivity: distance runs on RAW names."""
    rows = [(i, f"same {i:04d}") for i in range(1, 60)]
    # all 59 share prefix block "p:same"; suffixes are distinct
    df = _recs(spark, rows)
    assert blocking_pairs(df, "rid", "name", max_block=10).count() == 0
    # the unguarded form pairs every two records via the prefix block
    assert blocking_pairs(df, "rid", "name").count() == 59 * 58 // 2

    with pytest.raises(ValueError, match="max_block"):
        blocking_pairs(df, "rid", "name", max_block=1)
    with pytest.raises(ValueError, match="block_len"):
        blocking_pairs(df, "rid", "name", block_len=0)
    with pytest.raises(ValueError, match="max_edit"):
        resolve_entities(df, "rid", "name", max_edit=-1)


def test_hot_prefix_drop_keeps_cold_suffix_pairs(spark):
    """Regression (round-5 ADVICE): two records sharing a DROPPED
    hot prefix block must still pair via their shared cold suffix
    block — the first-matching-band dedup may only fire when both
    prefix rows actually joined. Here 59 records share the prefix
    block (hot, dropped at max_block=10); records 1 and 2 also share
    a suffix block (cold, 2 rows) and differ by one char inside the
    prefix region."""
    rows = [(1, "same prefix AA zz end"), (2, "same prefix AB zz end")]
    rows += [(i, f"same prefix {i:04d}") for i in range(3, 60)]
    df = _recs(spark, rows)
    # blocked on 12 chars: all 59 share "p:same prefix"; only 1,2
    # share "s:x AA zz end"-style suffixes? Use block_len so that
    # suffix of 1 and 2 agree: last 8 chars " zz end" + preceding.
    pairs = {
        (r["id_a"], r["id_b"])
        for r in blocking_pairs(
            df, "rid", "name", block_len=6, max_block=10
        ).collect()
    }
    assert (1, 2) in pairs  # met at suffix "zz end" despite hot prefix
    # and no quadratic prefix-block pairs survive
    assert all(a in (1, 2) and b in (1, 2) for a, b in pairs)

    # end-to-end: the pair must link into one entity
    out = {
        r["record_id"]: r["entity_id"]
        for r in resolve_entities(
            df, "rid", "name", max_edit=1, block_len=6, max_block=10
        ).collect()
    }
    assert out[1] == out[2] == 1


def test_both_keys_cold_pair_emitted_exactly_once_under_max_block(spark):
    """A pair colliding on BOTH (cold) keys is still emitted once —
    the NULL-aware dedup filter must not double-emit when max_block
    is set but neither block is hot."""
    df = _recs(spark, [(1, "abcdef"), (2, "abcdef"), (3, "zzzzzz")])
    got = blocking_pairs(df, "rid", "name", block_len=3, max_block=50)
    assert [(r["id_a"], r["id_b"]) for r in got.collect()] == [(1, 2)]


def test_char_bitmap_prefilter_is_result_preserving(spark):
    """The bitmap prefilter may only REMOVE pairs the edit bound
    already excludes: resolve_entities output equals a brute-force
    all-pairs levenshtein clustering on a corpus small enough to
    enumerate."""
    names = [
        (1, "alpha beta"),
        (2, "alpha betX"),   # dist 1 to #1
        (3, "alpha bXtX"),   # dist 2 to #1, 1 to #2
        (4, "gamma delta"),
        (5, "gamma delt"),   # dist 1 to #4
        (6, "epsilon zz"),
    ]
    df = _recs(spark, names)
    out = {
        r["record_id"]: r["entity_id"]
        for r in resolve_entities(
            df, "rid", "name", max_edit=2, block_len=4
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_null_handling(spark):
    """NULL ids are dropped (nothing to key); NULL names can never
    match but the record still gets a singleton entity row."""
    df = spark.createDataFrame(
        [(1, "alpha beta"), (None, "alpha beta"), (3, None)],
        "rid bigint, name string",
    )
    out = {r["record_id"]: r for r in resolve_entities(df, "rid", "name").collect()}
    assert set(out) == {1, 3}
    assert out[3]["entity_id"] == 3 and out[3]["n_members"] == 1
