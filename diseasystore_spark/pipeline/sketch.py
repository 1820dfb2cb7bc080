"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark's built-in ``hll_sketch_agg``/``hll_union_agg``, public API).

The 100 TB pattern for distinct counting: exact ``count_distinct``
must shuffle every distinct value; an HLL sketch is a small fixed-size
binary that (a) aggregates map-side, (b) MERGES across shards, days,
or incremental loads without revisiting raw data, and (c) answers
within ~1.6% at lgK=12. Build per-partition/per-day sketch rows once,
persist them next to the data, and roll ANY grouping up from sketches
alone — the pre-aggregation that turns "distinct users per month"
from a corpus scan into a few-row merge.

No SQL oracle (the estimate is approximate by design); tests pin the
relative-error envelope against exact counts AND the merge identity
(union of shard sketches == whole-corpus sketch, exactly — the union
is deterministic on the same binaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["distinct_sketches", "merge_sketch_rollup"]


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-group HLL sketch of ``value_col``: (group_cols...,
    sketch binary, estimate bigint). Map-side combinable; the shuffle
    carries lgK-sized binaries, never the distinct values."""
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
    return (
        df.groupBy(*group_cols)
        .agg(sk.alias(sketch_col))
        .withColumn(
            "estimate", F.hll_sketch_estimate(F.col(sketch_col))
        )
    )


def merge_sketch_rollup(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Roll precomputed sketch rows up to a coarser grouping (possibly
    ``[]``-adjacent: pass the subset of the original group columns).
    Touches only sketch rows — the raw data is never re-read."""
    agg = F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    if group_cols:
        out = sketches.groupBy(*group_cols).agg(agg)
    else:
        out = sketches.agg(agg)
    return out.withColumn(
        "estimate", F.hll_sketch_estimate(F.col(sketch_col))
    )


# --------------------------------------------------------------- Bloom
#
# Fixed-size membership sketch for decontamination at 100 TB: the
# exact path (``ngram_decontaminate``) broadcasts the benchmark's
# DISTINCT n-gram key set, which grows with the benchmark; a Bloom
# filter is a constant-size bit array (m bits ~ 128 KiB at m=2^20)
# regardless of benchmark size, at the price of a tunable
# false-positive rate — the right trade for a conservative drop-list
# when the "benchmark" is itself huge (e.g. an entire held-out
# corpus). Public technique (Bloom 1970; k-probe variant with
# Kirsch-Mitzenmacher double hashing, same family as the portable
# MinHash path, so one md5 per n-gram feeds all k probes and ANY SQL
# engine reproduces the sketch bit-for-bit — the q89 oracle builds
# the identical filter in DuckDB, false positives included).

_BLOOM_P = 2147483647  # 2^31 - 1, the double-hash modulus


def _ab_struct_sql(g: str) -> str:
    """(a, b) 31-bit Kirsch-Mitzenmacher pair from one md5 of ``g``."""
    return (
        f"named_struct("
        f"'a', cast(conv(substr(md5({g}), 1, 8), 16, 10) as bigint)"
        f" % {_BLOOM_P}, "
        f"'b', cast(conv(substr(md5({g}), 9, 8), 16, 10) as bigint)"
        f" % {_BLOOM_P})"
    )


def bloom_build_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 5,
    m: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Build a Bloom filter over the distinct word-``n``-grams of a
    corpus: ONE row ``(bloom map<bigint,bigint>, m int, k int)`` —
    the map holds only NON-ZERO 64-bit words of the bit array, so an
    underfull filter costs less than m/64 entries and a missing key
    reads as an all-zero word.

    Probe ``i`` of gram ``g`` sets bit ``(a + i*b) mod m`` where
    ``(a, b)`` are the two 31-bit halves of ``md5(g)`` — deterministic
    across engines. Build cost: one corpus scan + one distinct over
    hashed grams + a ``bit_or`` groupBy whose key space is at most
    m/64 — all map-side combinable, nothing driver-side.
    """
    if m <= 0 or k <= 0:
        raise ValueError("m and k must be positive")
    from diseasystore_spark.pipeline._util import spread
    from diseasystore_spark.pipeline.dedup import _ngram_sql

    grams = (
        f"filter(array_distinct({_ngram_sql(text_col, n)}), g -> g != '')"
    )
    ab = (
        spread(df)
        .select(
            F.explode(
                F.expr(f"transform({grams}, g -> {_ab_struct_sql('g')})")
            ).alias("__ab")
        )
        .distinct()
    )
    pos = ab.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {k - 1}), "
                f"i -> (__ab.a + i * __ab.b) % {m})"
            )
        ).alias("__p")
    ).distinct()
    masks = pos.select(
        F.expr("__p DIV 64").alias("__w"),
        F.expr("cast(__p % 64 as int)").alias("__bit"),
    ).groupBy("__w").agg(
        F.expr(
            "bit_or(shiftleft(cast(1 as bigint), __bit))"
        ).alias("__mask")
    )
    return masks.agg(
        F.map_from_arrays(
            F.collect_list("__w"), F.collect_list("__mask")
        ).alias("bloom"),
        F.lit(m).alias("m"),
        F.lit(k).alias("k"),
    )


def bloom_decontaminate(
    df: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    m: int = 1 << 20,
    k: int = 4,
    bloom: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination through a Bloom filter: flag every
    document with >= 1 word-``n``-gram that the filter reports as a
    benchmark member.

    Output: ``(id, n_flagged_ngrams, flagged)`` for EVERY document —
    the FP-inclusive analog of ``ngram_decontaminate`` (a superset of
    its flags: no false negatives by construction, false positives at
    the standard ``(1 - e^{-kn/m})^k`` rate). Deterministic: the same
    ``(m, k)`` filter yields the same flags on any engine, so the
    q89 oracle is hash-exact INCLUDING the false positives.

    Scale shape: the filter is built once (or passed prebuilt via
    ``bloom`` for the many-batches / streaming reuse path, same
    pattern as ``benchmark_keys``) and enters the doc scan as a
    one-row broadcast nested-loop join — constant-size state per
    executor, independent of benchmark cardinality. Flagging is a
    single narrow map over each document's distinct gram array: one
    md5 per gram, ``k`` map probes, zero shuffles, zero Python.
    """
    if (benchmark is None) == (bloom is None):
        raise ValueError("pass exactly one of benchmark or bloom")
    from diseasystore_spark.pipeline._util import spread
    from diseasystore_spark.pipeline.dedup import _ngram_sql

    filt = (
        bloom
        if bloom is not None
        else bloom_build_ngrams(benchmark, text_col, n, m, k)
    )
    grams = (
        f"filter(array_distinct({_ngram_sql(text_col, n)}), g -> g != '')"
    )
    probe = (
        f"forall(sequence(0, k - 1), i -> "
        f"(shiftright(coalesce(element_at(bloom, (s.a + i * s.b) % m DIV 64),"
        f" cast(0 as bigint)), cast((s.a + i * s.b) % m % 64 as int))"
        f" & 1) = 1)"
    )
    return (
        spread(df)
        .select(
            F.col(id_col),
            F.expr(
                f"transform({grams}, g -> {_ab_struct_sql('g')})"
            ).alias("__abs"),
        )
        .join(F.broadcast(filt))
        .select(
            F.col(id_col),
            F.expr(f"size(filter(__abs, s -> {probe}))")
            .cast("bigint")
            .alias("n_flagged_ngrams"),
        )
        .withColumn("flagged", F.col("n_flagged_ngrams") > 0)
    )


# ----------------------------------------------------------- Count-Min
#
# Fixed-size frequency sketch (Cormode & Muthukrishnan 2005, public):
# depth x width counters; every token increments one counter per row
# via the same md5 double-hash family as the Bloom filter, and a
# term's estimate is the MIN over rows — an overcount-only bound.
# The 100 TB story: counters key space is depth*width (a few thousand
# rows) regardless of vocabulary size, so the count shuffle map-side
# combines to a bounded frame where exact per-term counting shuffles
# the full distinct vocabulary. Deterministic hashing => the q90
# oracle rebuilds identical counters (and identical overcounts).


def cms_build_tokens(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min counters over whitespace tokens: ``(d int, bucket
    bigint, cnt bigint)`` — at most depth*width rows. Token
    occurrences COUNT (no per-doc dedup; this sketches the corpus
    term-frequency vector). One scan; the only shuffle is the
    (d, bucket)-keyed count, combinable to depth*width partials."""
    if depth <= 0 or width <= 0:
        raise ValueError("depth and width must be positive")
    from diseasystore_spark.pipeline._util import spread

    toks = (
        spread(df)
        .select(
            F.explode(
                F.expr(f"filter(split(trim({text_col}), '\\\\s+'), "
                       "t -> t != '')")
            ).alias("__t")
        )
        .select(F.expr(_ab_struct_sql("__t")).alias("__ab"))
    )
    return (
        toks.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, {depth - 1}), d -> "
                    f"named_struct('d', d, "
                    f"'bucket', (__ab.a + d * __ab.b) % {width}))"
                )
            ).alias("__db")
        )
        .groupBy(
            F.col("__db.d").alias("d"),
            F.col("__db.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch: ``(term, est_count)`` = min over the
    depth rows of the counter each probe lands in (missing counter =
    0). ``depth``/``width`` must match the build. The counter frame
    is at most depth*width rows — broadcast; the probe join is
    equi-keyed on (d, bucket)."""
    probes = terms.select(
        F.col(term_col).alias("term"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {depth - 1}), d -> "
                f"named_struct('d', d, 'bucket', "
                f"(({_ab_struct_sql(term_col)}).a "
                f"+ d * ({_ab_struct_sql(term_col)}).b) % {width}))"
            )
        ).alias("__db"),
    ).select(
        "term",
        F.col("__db.d").alias("d"),
        F.col("__db.bucket").alias("bucket"),
    )
    return (
        probes.join(F.broadcast(counters), ["d", "bucket"], "left")
        .groupBy("term")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("est_count")
        )
    )
