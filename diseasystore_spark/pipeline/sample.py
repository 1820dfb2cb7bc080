"""Deterministic sampling / splitting / packing for training-data curation.

A large-scale pipeline cannot use ``df.sample()`` for corpus curation:
nondeterministic sampling makes runs unreproducible, resists
memoization (the engine's SCD2 checksums would churn on every run),
and cannot be sharded consistently across tables (the same document
must land in the same split everywhere it appears). The standard fix
is *hash-based* sampling: a stable key is hashed with a salt and the
hash decides membership. Every operator here is a pure function of
(key, salt) — rerunning, resharding, or recomputing on another
cluster yields byte-identical membership.

Engine parity: we hash with MD5 (``F.md5``) and compare the first
8 hex characters *as strings*. Fixed-width lowercase hex compares
lexicographically exactly like the integer it encodes, so thresholds
are plain string literals and the whole predicate is expressible in
any SQL engine (the DuckDB oracles in ``queries.py`` run the very
same expression) — no engine-specific hash function leaks into
results, unlike ``xxhash64``/``hash()`` whose seeds differ per engine.

Scale notes:
- ``hash_sample`` / ``hash_split`` are narrow (projection + filter):
  zero shuffles, survive any scale-up, and compose with partition
  pruning — membership is decided row-locally.
- ``stratified_sample`` shuffles once on the strata (a window top-n).
  For heavily skewed strata at 100 TB, pre-thin with ``hash_sample``
  at a rate safely above ``n / stratum_size`` first so the window
  sorts a bounded candidate set instead of the full stratum.
- ``pack_sequences`` shuffles once on the strata and assigns packs by
  running token sum — a deterministic analogue of greedy sequence
  packing for LLM pre-training batches.

No analogue in the reference (`diseasystore` never samples); this is
part of the training-data extension surface required by the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_hex",
    "hash_sample",
    "hash_split",
    "stratified_sample",
    "pack_sequences",
    "weighted_sample",
    "curriculum_order",
]

#: Width of the hex prefix used for thresholding. 8 hex chars = 32
#: bits; rate granularity 2^-32 is far below any practical need.
_PREFIX = 8
_SPACE = 16**_PREFIX


def hash_hex(key: Column, salt: str = "") -> Column:
    """Deterministic 8-hex-char bucket for ``key``.

    ``md5(salt || '|' || key)`` truncated to its first 8 hex chars.
    The salt namespaces independent decisions (the split salt and a
    downstream sample salt must differ, or membership correlates).
    """
    payload = F.concat(F.lit(f"{salt}|"), key.cast("string"))
    return F.substring(F.md5(payload.cast("binary")), 1, _PREFIX)


def _temp_col(df: DataFrame, base: str) -> str:
    """A working-column name guaranteed not to collide with ``df``'s."""
    name = base
    while name in df.columns:
        name += "_"
    return name


def _threshold(rate: float) -> str:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(round(rate * _SPACE), _SPACE - 1), f"0{_PREFIX}x")


def hash_sample(
    df: DataFrame, key: str, rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli-by-key sample: keep rows whose hash
    bucket falls below ``rate`` of the 32-bit space.

    Narrow plan (no shuffle, no state); all rows sharing ``key`` are
    kept or dropped together, so sampling is consistent across any
    table keyed by the same id. NULL keys hash to NULL and are
    *dropped* by the comparison (three-valued logic); keys are
    expected non-null.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate == 1.0:
        return df
    return df.where(hash_hex(F.col(key), salt) < F.lit(_threshold(rate)))


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to exactly one named split (train/val/test …)
    by hash range. Weights must sum to 1 (±1e-9). Deterministic,
    narrow, and exhaustive: the ranges tile the full hash space, so
    every row gets a label and the labels partition the corpus. NULL
    keys hash to NULL: every range test is NULL, so they fall through
    to the *last* split (unlike ``hash_sample``, which drops them);
    keys are expected non-null.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_hex(F.col(key), salt)
    names = list(weights)
    cum = 0.0
    expr: Column | None = None
    for name in names[:-1]:
        # Clamp: cumulative float addition of the first n-1 weights can
        # marginally exceed 1.0 even when the full sum passes the check.
        cum = min(cum + weights[name], 1.0)
        cond = bucket < F.lit(_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(split_col, expr)


def group_safe_split(
    df: DataFrame,
    key: str,
    components: DataFrame,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
    group_col: str = "group_id",
) -> DataFrame:
    """Leakage-safe train/val/test split: rows whose keys belong to
    the same near-duplicate component ALWAYS land in the same split —
    the decontaminated-split step of a training pipeline (a plain
    per-row ``hash_split`` leaks: near-identical documents straddle
    the train/test boundary and inflate eval scores).

    ``components`` is an ``(id, component)`` frame — the output of
    ``dedup_components`` / ``dedup_components_text`` — mapping each
    member key to its cluster representative. The split is
    ``hash_split`` evaluated on ``group_id = coalesce(component,
    key)``: membership is a pure function of the GROUP key, so every
    member of a component hashes identically (no second pass, no
    group-level join-back), and keys absent from ``components``
    (singleton documents) hash on their own key — for them the split
    degrades to exactly ``hash_split(df, key, ...)`` with the same
    salt. Expected split sizes are weight-proportional in GROUPS (a
    giant component lands whole — that is the point).

    Distributed shape: ONE equi-join of the corpus with the
    component frame (unique ids on the build side — no fan-out; AQE
    broadcasts it when the near-dup set is small) plus the narrow
    hash CASE. No reference analogue (training-data extension
    surface).

    Output: ``df`` plus ``group_col`` (the split key actually
    hashed) and ``split_col``.
    """
    if group_col in df.columns:
        raise ValueError(
            f"column {group_col!r} already exists; pass group_col="
        )
    gid = _temp_col(df, "__gsid")
    comp = components.select(
        F.col("id").alias(gid), F.col("component").alias(group_col)
    )
    out = (
        df.join(comp, df[key] == F.col(gid), "left")
        .drop(gid)
        .withColumn(group_col, F.coalesce(F.col(group_col), F.col(key)))
    )
    return hash_split(out, group_col, weights, salt=salt, split_col=split_col)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    key: str,
    salt: str = "",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by hash
    order (ties broken by the key itself, so selection is total and
    deterministic). One shuffle on the strata columns.

    Requires ``key`` to be unique and non-null per row: duplicate keys
    tie on both sort expressions (hash and key), leaving row_number
    order engine-arbitrary, and NULL keys hash to NULL (which sorts
    first in Spark but last in most SQL engines' defaults).
    """
    rk = _temp_col(df, "__rk")
    w = Window.partitionBy(*strata).orderBy(
        hash_hex(F.col(key), salt), F.col(key)
    )
    return (
        df.withColumn(rk, F.row_number().over(w))
        .where(F.col(rk) <= n_per_stratum)
        .drop(rk)
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    key: str,
    strata: list[str] | None = None,
    salt: str = "",
    pack_col: str = "pack_id",
    auto_strata: int = 64,
) -> DataFrame:
    """Greedy contiguous sequence packing: order documents by hash
    within each stratum, run a cumulative token sum, bucket by
    ``floor(start_offset / budget)``, then densify bucket numbers with
    a dense_rank so ``pack_id`` is contiguous ``0..n_packs-1`` per
    stratum.

    Each document lands wholly in one pack. A document with
    ``token_col > budget`` spans several raw budget windows; the
    densify step collapses the resulting gaps, so downstream batch
    iteration can still enumerate ``range(n_packs)``. Packs fill to at
    least ``budget`` tokens except possibly the last per stratum
    (boundary-straddling documents overflow their pack — standard
    greedy packing slack, bounded by the max document length).

    The hash order makes packs a deterministic random shuffle of the
    corpus, which is exactly what pre-training batch construction
    wants. Requires ``key`` unique and non-null per row (duplicate
    keys make the within-tie order engine-arbitrary). Single shuffle
    on the strata; the densify window sorts by a value monotone in the
    first window's order, so no second shuffle.

    With ``strata=None`` the corpus is packed under ``auto_strata``
    synthetic hash strata (an md5 bucket of ``key``, salt-namespaced
    so it is independent of the within-stratum order hash), then pack
    ids are offset by the pack counts of the preceding strata — so the
    output ids are STILL globally contiguous ``0..n_packs-1``, but the
    windows are always partitioned: nothing funnels through a single
    task at any corpus size. The stratum offsets come from one
    ``auto_strata``-row aggregate broadcast back onto the corpus.
    Deterministic for a given (salt, auto_strata); set
    ``auto_strata=1`` to force one global greedy sequence.
    """
    synthetic = strata is None
    st_col = None
    if synthetic:
        st_col = _temp_col(df, "__stratum")
        df = df.withColumn(
            st_col,
            F.pmod(
                F.conv(
                    hash_hex(F.col(key), f"{salt}|stratum"), 16, 10
                ).cast("bigint"),
                F.lit(auto_strata),
            ),
        )
        parts = [F.col(st_col)]
    else:
        parts = [F.col(c) for c in strata]
    order = [hash_hex(F.col(key), salt), F.col(key)]
    w = Window.partitionBy(*parts).orderBy(*order)
    cum = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (cum - F.col(token_col)).cast("long")
    raw = _temp_col(df, "__raw_pack")
    with_raw = df.withColumn(raw, F.floor(start / F.lit(budget)))
    w2 = Window.partitionBy(*parts).orderBy(F.col(raw))
    out = with_raw.withColumn(
        pack_col, (F.dense_rank().over(w2) - 1).cast("long")
    ).drop(raw)
    if synthetic:
        # Global contiguity across the synthetic strata: offset each
        # stratum by the total packs of the strata before it. The
        # counts frame is at most ``auto_strata`` rows — its
        # single-task window and the broadcast join are trivially
        # cheap at any corpus size.
        counts = out.groupBy(st_col).agg(
            (F.max(pack_col) + 1).alias("__n_packs")
        )
        w_ofs = Window.orderBy(st_col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = counts.select(
            F.col(st_col),
            F.coalesce(F.sum("__n_packs").over(w_ofs), F.lit(0)).alias(
                "__ofs"
            ),
        )
        out = (
            out.join(F.broadcast(offsets), st_col)
            .withColumn(pack_col, (F.col(pack_col) + F.col("__ofs")).cast("long"))
            .drop(st_col, "__ofs")
        )
    return out


def mixture_weights(
    df: DataFrame,
    target: dict[str, float],
    strata_col: str = "source",
) -> DataFrame:
    """Domain-mixture reweighting: per-stratum sampling weights that
    reshape the corpus's source mixture into ``target`` (the standard
    pretraining-mixture step — e.g. DoReMi/Pile-style fixed domain
    proportions, public technique). A stratum absent from ``target``
    gets weight 0 (dropped from the mixture).

    Output: (stratum, n_docs, actual_ppm, weight_micro) where
    ``actual_ppm = round(n/total * 1e6)`` and ``weight_micro =
    round(target_frac * total / n * 1e6)`` — resampling each stratum
    by ``weight_micro/1e6`` (e.g. via ``hash_sample`` at that rate,
    or repetition for weights > 1) yields the target mixture.
    Integer-micro outputs keep the result bigint-exact across engines
    (the q62 oracle): one double division + multiply per stratum, on
    identical integer operands.

    Scale shape: ONE map-side-combinable count per stratum (strata
    counts are the smallest aggregate in the warehouse) + a broadcast
    one-row total. Pure plan builder — no driver action."""
    if not target:
        raise ValueError("target must contain at least one stratum")
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = counts.agg(F.sum("n_docs").alias("__total"))
    pairs: list[Column] = []
    for name, frac in target.items():
        pairs += [F.lit(name), F.lit(float(frac))]
    tmap = F.create_map(*pairs)
    tf = F.coalesce(
        F.element_at(tmap, F.col("stratum")), F.lit(0.0)
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "stratum",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round(
                F.col("n_docs").cast("double") / F.col("__total") * 1e6
            )
            .cast("bigint")
            .alias("actual_ppm"),
            F.round(
                tf * F.col("__total").cast("double") / F.col("n_docs") * 1e6
            )
            .cast("bigint")
            .alias("weight_micro"),
        )
    )


def select_within_budget(
    df: DataFrame,
    score_col: str,
    size_col: str,
    budget: int,
    id_col: str = "doc_id",
    coarse_div: int | None = None,
) -> DataFrame:
    """Budget-capped greedy selection: rank documents by
    ``(score desc, id asc)`` and keep the prefix whose cumulative
    ``size_col`` stays within ``budget`` — the "take the best
    documents until the token budget is spent" step that follows any
    quality/importance scoring pass (q64 composes it with the
    unigram-LM score).

    Output: (id, score, size, cum_size, selected) for EVERY document,
    with ``cum_size`` the inclusive running total in rank order and
    ``selected = cum_size <= budget``.

    Scale shape — a naive global window (``ORDER BY score``, no
    partition) funnels the corpus through ONE task; this is instead
    the classic two-level distributed prefix sum: (1) per-BUCKET size
    totals (map-side combinable), (2) an exclusive running total
    ACROSS buckets — a window over the bucket frame, whose row count
    is the bucket cardinality, not the corpus, (3) an intra-bucket
    running total partitioned BY bucket, ordered ``(score desc, id)``.
    Only step 2 is single-task, and it is bounded by bucket count.

    The bucket is the score itself by default — right when scores
    repeat heavily (quality tiers, integer stars). For near-unique
    scores (integer-micro LM scores: one doc ≈ one score) set
    ``coarse_div`` to quantize: ``bucket = score DIV coarse_div``
    (truncating integer division — monotone for any positive divisor,
    which is all correctness needs). The RESULT is invariant to the
    choice; only the level-1/level-3 work split moves. Pick a divisor
    that yields thousands of buckets (e.g. ``coarse_div=100_000`` for
    micro-scaled scores spanning a few units). Identical to the naive
    global cumsum either way (oracle-verified)."""
    if coarse_div is not None and coarse_div <= 0:
        raise ValueError("coarse_div must be positive")
    base = df.select(
        F.col(id_col),
        F.col(score_col).alias("score"),
        F.col(size_col).alias("size"),
    )
    bucket = (
        F.expr(f"score DIV {coarse_div}")
        if coarse_div is not None
        else F.col("score")
    )
    base = base.withColumn("__b", bucket)
    groups = base.groupBy("__b").agg(F.sum("size").alias("__gsz"))
    gw = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefixes = groups.select(
        "__b",
        F.coalesce(F.sum("__gsz").over(gw), F.lit(0)).alias("__prefix"),
    )
    iw = (
        Window.partitionBy("__b")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(prefixes), "__b")
        .withColumn(
            "cum_size",
            (F.col("__prefix") + F.sum("size").over(iw)).cast("bigint"),
        )
        .select(
            id_col,
            "score",
            F.col("size").cast("bigint").alias("size"),
            "cum_size",
            (F.col("cum_size") <= budget).alias("selected"),
        )
    )


def build_mixture(
    df: DataFrame,
    target: dict[str, float],
    key: str = "doc_id",
    strata_col: str = "source",
    salt: str = "mixture",
) -> DataFrame:
    """Materialize a target domain mixture by deterministic
    downsampling — the step AFTER ``mixture_weights`` decides the
    rates: actually build the training mix (Pile/Dolma-style fixed
    domain proportions, public technique).

    With downsampling only (no document repetition), the largest
    corpus whose composition matches ``target`` has total size
    ``T = min over target strata of (n_s / w_s)``; each stratum then
    keeps ``rate_s = w_s * T / n_s`` of its documents (the binding
    stratum keeps everything). Strata absent from ``target`` — and
    target strata with zero corpus presence — contribute nothing.

    Returns the surviving rows of ``df`` (all original columns).
    Selection is ``hash_sample``-style by-key Bernoulli (md5 bucket
    below a per-stratum threshold), so it is deterministic,
    repetition-free, and consistent across tables keyed by the same
    id. The per-stratum thresholds are computed IN the plan —
    stratum counts aggregate -> one-row capacity -> broadcast rates
    join — so this stays a pure plan builder with no driver action;
    both engines compute ``round(w*T/n * 2^32)`` on identical
    integer/double operands (the q71 oracle reproduces it verbatim).

    Expected composition error is O(sqrt(n_s)) per stratum (Bernoulli
    by hash, not exact-count sampling); for exact-count selection
    compose ``select_within_budget`` per stratum instead.
    """
    if not target:
        raise ValueError("target must contain at least one stratum")
    bad = {k: v for k, v in target.items() if v <= 0}
    if bad:
        raise ValueError(f"target weights must be positive, got {bad}")
    total_w = sum(target.values())
    if abs(total_w - 1.0) > 1e-9:
        raise ValueError(f"target weights must sum to 1, got {total_w}")

    pairs: list[Column] = []
    for name, frac in target.items():
        pairs += [F.lit(name), F.lit(float(frac))]
    tmap = F.create_map(*pairs)

    counts = (
        df.where(F.col(strata_col).isin(list(target)))
        .groupBy(F.col(strata_col).alias("__stratum"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__w", F.element_at(tmap, F.col("__stratum")))
    )
    capacity = counts.agg(
        F.min(F.col("__n").cast("double") / F.col("__w")).alias("__t")
    )
    rates = counts.crossJoin(F.broadcast(capacity)).select(
        "__stratum",
        F.round(
            F.col("__w") * F.col("__t") / F.col("__n").cast("double")
            * F.lit(float(_SPACE))
        )
        .cast("bigint")
        .alias("__thr"),
    )
    bucket = F.conv(hash_hex(F.col(key), salt), 16, 10).cast("bigint")
    return (
        df.join(
            F.broadcast(rates), df[strata_col] == rates["__stratum"]
        )
        .where(bucket < F.col("__thr"))
        .drop("__stratum", "__thr")
    )


def epoch_shuffle(
    df: DataFrame,
    key: str = "doc_id",
    seed: str = "epoch0",
    buckets: int = 1024,
    rank_col: str = "rank",
) -> DataFrame:
    """Deterministic global training-order permutation: every row gets
    a dense 0-based ``rank`` equal to its position in ascending
    ``(md5(seed|key), key)`` order — the "shuffle the corpus
    differently each epoch, reproducibly" step of a training-data
    loader (vary ``seed`` per epoch; ties impossible since ``key``
    breaks hash collisions deterministically).

    Scale shape — the naive ``row_number() OVER (ORDER BY hash)`` is
    a single-task global window; this is the two-level rank instead
    (same pattern as ``select_within_budget``): hash-PREFIX range
    buckets (monotone in the sort order, so bucket ranks concatenate),
    per-bucket counts (map-side combinable, ``buckets`` rows), an
    exclusive prefix over that tiny frame, and an intra-bucket
    ``row_number`` partitioned by bucket. Only the ``buckets``-row
    window is single-task. Result identical to the naive global
    window (the q75 oracle IS the naive form).

    With the default 1024 buckets a uniform md5 gives ~N/1024 rows
    per window partition; raise ``buckets`` (power of two — the 32-bit
    space must divide evenly so bucket boundaries stay exact) so a
    partition fits in executor memory at your corpus size.
    """
    if buckets <= 0 or (buckets & (buckets - 1)) != 0 or buckets > _SPACE:
        raise ValueError(
            f"buckets must be a positive power of two <= 2^32, got {buckets}"
        )
    width = _SPACE // buckets
    h = F.conv(hash_hex(F.col(key), seed), 16, 10).cast("bigint")
    base = df.withColumn("__h", h).withColumn(
        "__b", F.expr(f"__h DIV {width}")
    )
    counts = base.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    gw = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = counts.select(
        "__b", F.coalesce(F.sum("__n").over(gw), F.lit(0)).alias("__prefix")
    )
    iw = Window.partitionBy("__b").orderBy("__h", key)
    return (
        base.join(F.broadcast(prefixes), "__b")
        .withColumn(
            rank_col,
            (F.col("__prefix") + F.row_number().over(iw) - 1).cast("bigint"),
        )
        .drop("__h", "__b", "__prefix")
    )


def stratified_sample_scalable(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    key: str,
    salt: str = "",
    buckets: int = 1024,
) -> DataFrame:
    """``stratified_sample`` with the two-level distributed rank — the
    scale path when a single stratum is corpus-sized (one web-crawl
    language, one source domain) and the naive per-stratum
    ``row_number`` window would funnel it through one task.

    Selection is IDENTICAL to ``stratified_sample`` (same hash order,
    same tie-break on ``key``): the 32-bit hash space is cut into
    ``buckets`` range bands (monotone in the hash, so band ranks
    concatenate), per-(strata, band) counts are map-side combinable,
    the exclusive prefix runs over the tiny per-stratum band frame,
    and ``row_number`` only ever partitions by (strata, band). A row
    is kept when band-prefix + in-band rank <= n. Same contract:
    ``key`` unique and non-null.
    """
    if buckets <= 0 or (buckets & (buckets - 1)) != 0 or buckets > _SPACE:
        raise ValueError(
            f"buckets must be a positive power of two <= 2^32, got {buckets}"
        )
    width = _SPACE // buckets
    h = _temp_col(df, "__h")
    b = _temp_col(df, "__b")
    base = df.withColumn(h, hash_hex(F.col(key), salt)).withColumn(
        b, F.expr(f"cast(conv({h}, 16, 10) as bigint) DIV {width}")
    )
    counts = base.groupBy(*strata, b).agg(F.count(F.lit(1)).alias("__n"))
    gw = (
        Window.partitionBy(*strata)
        .orderBy(F.col(b))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = counts.select(
        *strata,
        b,
        F.coalesce(F.sum("__n").over(gw), F.lit(0)).alias("__prefix"),
    )
    iw = Window.partitionBy(*strata, b).orderBy(F.col(h), F.col(key))
    rk = _temp_col(df, "__rk")
    return (
        base.join(F.broadcast(prefixes), [*strata, b])
        .withColumn(rk, F.col("__prefix") + F.row_number().over(iw))
        .where(F.col(rk) <= n_per_stratum)
        .drop(h, b, "__prefix", rk)
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "ws",
    by: list[str] | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, public — the "A-ES" exponential-key
    method): each row gets key ``ln(u) / w`` with ``u`` a
    hash-derived uniform in (0, 1), and the top ``n`` keys ARE a
    weighted sample without replacement. Derandomized: ``u`` comes
    from ``md5(salt | id)``, so the same (corpus, salt) selects the
    same rows on every run and engine — the reproducibility contract
    every training-data pipeline needs from its sampler, which
    ``df.sample()`` cannot give across partitionings.

    ``by`` switches to top-``n`` PER GROUP (weighted stratified
    sampling). Rows with NULL or non-positive weight are never
    sampled (dropped before keying — zero weight means zero
    inclusion probability; A-ES is undefined for w <= 0).

    Scale shape: global form is one narrow projection +
    ``TakeOrderedAndProject`` (distributed partial top-n, no global
    sort, no single-task window); grouped form is a per-group
    ``row_number`` window. ``key_col`` exposes the sampling key for
    audit. Ties (impossible barring md5 collisions) break by id.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    u = (
        F.expr(
            f"cast(conv(substr(md5(concat('{salt}', '|', "
            f"cast({id_col} as string))), 1, 8), 16, 10) as bigint)"
        )
        + F.lit(0.5)
    ) / F.lit(float(_SPACE))
    key = F.log(u) / F.col(weight_col).cast("double")
    kc = key_col or "__wkey"
    out = (
        df.where(
            F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
        )
        .withColumn(kc, key)
    )
    if by:
        w = Window.partitionBy(*by).orderBy(
            F.col(kc).desc(), F.col(id_col)
        )
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n)
            .drop("__rn")
        )
    else:
        out = out.orderBy(F.col(kc).desc(), F.col(id_col)).limit(n)
    return out if key_col else out.drop(kc)


_H31_P = 2147483647  # 2^31 - 1, shared with the sketch hash family


def _h31(expr: str) -> str:
    """Portable 31-bit hash SQL: first 8 hex digits of md5, mod
    2^31-1 — the same engine-reproducible family the Bloom/CMS
    sketches use (any SQL engine with md5() replays it exactly)."""
    return (
        f"cast(conv(substr(md5({expr}), 1, 8), 16, 10) as bigint)"
        f" % {_H31_P}"
    )


def contrastive_triplets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    n_buckets: int = 16,
    max_df: int | None = None,
    pair_method: str = "exact",
    density_guard: str = "raise",
) -> DataFrame:
    """(anchor, positive, negative) training triplets for contrastive
    / embedding-model fine-tuning: positives are near-duplicate pairs
    (word-``n``-gram Jaccard >= ``threshold``, via
    :func:`~diseasystore_spark.pipeline.dedup.jaccard_pairs`), and
    each pair's negative is a deterministic pseudo-random corpus
    document — the standard (a, p, n) mining step of a large-scale
    embedding pipeline, with hash-derived randomness so the output is
    reproducible run-to-run and engine-to-engine (no rand(), no seed
    state).

    Negative selection: every document is assigned to one of
    ``n_buckets`` hash buckets; each pair hashes to a TARGET bucket
    and takes, among that bucket's documents excluding its own two
    members, the one minimizing a per-(pair, candidate) hash — i.e. a
    uniform-at-random-in-expectation draw that is a pure function of
    the ids. A pair whose target bucket holds no eligible document is
    dropped (deterministic; vanishingly rare once buckets hold more
    than a few documents). Ids are hashed via their string form
    joined with ``':'`` — string ids containing ``':'`` could collide
    pair keys; use numeric or colon-free ids.

    Output: ``(anchor_id, positive_id, negative_id, jaccard)`` with
    ``anchor_id < positive_id``.

    Scale shape: the pair side is near-dup-sized (not corpus-sized)
    — and when the EXACT pair stage itself is the bottleneck (flat-df
    word-soup corpora; see q130's sf1 note in SCALE.md),
    ``pair_method="minhash"`` swaps it for the banded-LSH candidate
    join, whose volume is band-bucket-bounded (positives then carry
    the estimated Jaccard). The corpus side is replicated exactly
    once (one bucket per doc);
    the candidate join is a plain equi-join on the bucket id, so each
    pair scans ~|corpus| / ``n_buckets`` candidates — size
    ``n_buckets`` ~ |corpus| / 64 to bound the fan-out, keeping the
    min-hash pick a map-side-combinable ``min_by``. All hashes are
    the portable md5-based 31-bit family, so a SQL oracle reproduces
    the triplets exactly.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if pair_method == "exact":
        from diseasystore_spark.pipeline.dedup import jaccard_pairs

        pairs = jaccard_pairs(
            df,
            id_col=id_col,
            text_col=text_col,
            n=n,
            threshold=threshold,
            max_df=max_df,
            density_guard=density_guard,
        )
    elif pair_method == "minhash":
        # Banded-LSH scale path: candidate volume is bucket-bounded
        # instead of sum(df^2) over shingles — the right default when
        # the exact pair stage dominates (same trade as the other
        # dedup entry points; positives are then estimated-Jaccard).
        from diseasystore_spark.pipeline.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            df,
            id_col=id_col,
            text_col=text_col,
            n=n,
            min_est_jaccard=threshold,
        ).withColumnRenamed("est_jaccard", "jaccard")
    else:
        raise ValueError(
            f"pair_method must be 'exact' or 'minhash', got "
            f"{pair_method!r}"
        )
    docs = df.select(
        F.col(id_col).alias("__neg"),
        F.expr(
            f"{_h31(f'cast({id_col} as string)')} % {n_buckets}"
        ).alias("__b"),
    )
    pair_key = "concat(cast(id_a as string), ':', cast(id_b as string))"
    keyed = pairs.select(
        "id_a",
        "id_b",
        "jaccard",
        F.expr(f"{_h31(pair_key)} % {n_buckets}").alias("__b"),
    )
    cand = (
        keyed.join(docs, "__b")
        .where(
            (F.col("__neg") != F.col("id_a"))
            & (F.col("__neg") != F.col("id_b"))
        )
        .select(
            "id_a",
            "id_b",
            "jaccard",
            "__neg",
            F.expr(
                _h31(f"concat({pair_key}, ':', cast(__neg as string))")
            ).alias("__score"),
        )
    )
    return (
        cand.groupBy("id_a", "id_b", "jaccard")
        .agg(F.min(F.struct("__score", "__neg")).alias("__pick"))
        .select(
            F.col("id_a").alias("anchor_id"),
            F.col("id_b").alias("positive_id"),
            F.col("__pick.__neg").alias("negative_id"),
            "jaccard",
        )
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_stages: int = 10,
    seed: str = "curriculum0",
    buckets: int = 1024,
    sketch_k: int = 32768,
) -> DataFrame:
    """Curriculum-learning schedule: a dense 0-based global
    ``curriculum_rank`` that presents STAGES in ascending score order
    (stage 0 = lowest-score decile = "easiest" under a
    short-before-long / clean-before-noisy heuristic) while
    SHUFFLING deterministically within each stage — the standard
    curriculum data-loader contract (vary ``seed`` per epoch to
    reshuffle within stages without changing the stage schedule).

    Stages are equi-probable score buckets from a KLL sketch
    (:func:`diseasystore_spark.pipeline.sketch.kll_bucketize`), so
    stage assignment never sorts the corpus by score — boundaries are
    a broadcast (n_stages-1)-element array built from one sketch
    pass, reusable across epochs via ``kll_merge``. NULL scores are
    excluded (no stage is defensible for them; filter upstream to
    keep them).

    Scale shape — the naive ``row_number() OVER (ORDER BY stage,
    hash)`` is a single-task global window; this is the two-level
    rank of :func:`epoch_shuffle` over the COMPOSITE bucket
    ``stage * buckets + hash_bucket`` (monotone in the (stage, hash)
    sort order, so per-bucket ranks concatenate): per-bucket counts
    (map-side combinable, ≤ n_stages × buckets rows), an exclusive
    prefix over that tiny frame (the only single-task step), and an
    intra-bucket ``row_number``. Result identical to the naive
    global window (the q142 oracle IS the naive form).

    Output: ``(id_col, score_col, stage int, curriculum_rank
    bigint)``.
    """
    from diseasystore_spark.pipeline.sketch import kll_bucketize, kll_build

    if n_stages < 2:
        raise ValueError("n_stages must be at least 2")
    if buckets <= 0 or (buckets & (buckets - 1)) != 0 or buckets > _SPACE:
        raise ValueError(
            f"buckets must be a positive power of two <= 2^32, got {buckets}"
        )
    base = df.select(id_col, score_col).where(
        F.col(score_col).isNotNull() & F.col(id_col).isNotNull()
    )
    sk = kll_build(base, score_col, k=sketch_k)
    staged = kll_bucketize(
        base, score_col, sk, n_buckets=n_stages, bucket_col="stage"
    )
    width = _SPACE // buckets
    h = F.conv(hash_hex(F.col(id_col), seed), 16, 10).cast("bigint")
    staged = staged.withColumn("__h", h).withColumn(
        "__cb", F.col("stage").cast("bigint") * buckets + F.expr(f"__h DIV {width}")
    )
    counts = staged.groupBy("__cb").agg(F.count(F.lit(1)).alias("__n"))
    gw = Window.orderBy("__cb").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = counts.select(
        "__cb", F.coalesce(F.sum("__n").over(gw), F.lit(0)).alias("__prefix")
    )
    iw = Window.partitionBy("__cb").orderBy("__h", id_col)
    return (
        staged.join(F.broadcast(prefixes), "__cb")
        .withColumn(
            "curriculum_rank",
            (F.col("__prefix") + F.row_number().over(iw) - 1).cast("bigint"),
        )
        .select(id_col, score_col, "stage", "curriculum_rank")
    )


def group_safe_folds(
    df: DataFrame,
    key: str,
    components: DataFrame,
    k: int,
    salt: str = "",
    fold_col: str = "fold",
    group_col: str = "group_id",
) -> DataFrame:
    """Leakage-safe k-fold cross-validation assignment — the k-fold
    twin of :func:`group_safe_split`: every member of a near-duplicate
    component gets the SAME fold, so no CV round ever trains on a
    near-copy of its held-out documents. ``fold`` is the equi-width
    range bucket of the group key's 32-bit md5 prefix
    (``floor(h * k / 2^32)`` — exact integer math, no float rates),
    so folds are weight-uniform in GROUPS and any external engine
    reproduces the assignment. Keys absent from ``components`` fold
    on their own key (singleton degradation, as in the split).

    Same distributed shape as the split: ONE corpus-components
    equi-join plus a narrow integer expression.

    Output: ``df`` plus ``group_col`` and ``fold_col`` (int in
    ``[0, k)``).
    """
    if k < 2:
        raise ValueError("k must be at least 2")
    if group_col in df.columns or fold_col in df.columns:
        raise ValueError(
            f"column {group_col!r}/{fold_col!r} already exists; rename"
        )
    gid = _temp_col(df, "__gfid")
    comp = components.select(
        F.col("id").alias(gid), F.col("component").alias(group_col)
    )
    out = (
        df.join(comp, df[key] == F.col(gid), "left")
        .drop(gid)
        .withColumn(group_col, F.coalesce(F.col(group_col), F.col(key)))
    )
    hcol = _temp_col(out, "__gfh")
    return (
        out.withColumn(
            hcol,
            F.conv(hash_hex(F.col(group_col), salt), 16, 10).cast("bigint"),
        )
        .withColumn(
            fold_col, F.expr(f"{hcol} * {k} DIV {_SPACE}").cast("int")
        )
        .drop(hcol)
    )


def temperature_mixture_weights(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-resampled mixture weights: sampling weight
    ``w_g ∝ share_g^alpha`` per corpus slice — the standard
    low-resource up-sampling scheme (alpha=1 is proportional,
    alpha→0 is uniform; multilingual LM training popularized
    alpha≈0.3-0.7). Output feeds ``build_mixture``/``hash_split``
    as per-slice rates.

    Engine-portable exactness: for the default ``alpha=0.5`` the
    powered share is computed as
    ``floor(sqrt((n_g·10^24) // N))`` — integer floor division, an
    IEEE-exact int→double conversion, and a CORRECTLY-ROUNDED sqrt,
    so every engine produces the identical scaled integer and the
    weight denominators are exact integer sums (libm ``pow`` carries
    no such guarantee, which is why the general-alpha path below is
    documented as last-ulp-portable only, not bit-guaranteed).

    Output: ``(group, n bigint, share double, weight double, boost
    double)`` where ``boost = weight / share`` (the up/down-sampling
    factor the slice receives).

    Scale shape: one combinable count per slice; everything else
    runs on the |slices|-row frame.
    """
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    counts = (
        df.where(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("group"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    total = counts.agg(
        F.sum("n").cast("decimal(38,0)").alias("__N")
    )
    w = counts.crossJoin(F.broadcast(total))
    if alpha == 0.5:
        powered = F.floor(
            F.sqrt(
                F.floor(
                    F.col("n").cast("decimal(38,0)")
                    * F.lit("1" + "0" * 24).cast("decimal(38,0)")
                    / F.col("__N")
                ).cast("double")
            )
        ).cast("decimal(38,0)")
    else:
        powered = F.floor(
            F.pow(
                F.col("n").cast("double") / F.col("__N").cast("double"),
                F.lit(float(alpha)),
            )
            * F.lit(1e12)
        ).cast("decimal(38,0)")
    scored = w.withColumn("__p", powered)
    denom = scored.agg(
        F.sum("__p").cast("decimal(38,0)").alias("__D")
    )
    return (
        scored.crossJoin(F.broadcast(denom))
        .select(
            "group",
            "n",
            (F.col("n").cast("double") / F.col("__N").cast("double")).alias(
                "share"
            ),
            (
                F.col("__p").cast("double") / F.col("__D").cast("double")
            ).alias("weight"),
            (
                (F.col("__p").cast("double") / F.col("__D").cast("double"))
                / (F.col("n").cast("double") / F.col("__N").cast("double"))
            ).alias("boost"),
        )
    )
