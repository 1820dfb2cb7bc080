"""Streaming incremental deduplication: screen document micro-batches
against a static reference corpus.

This is how near-dup screening actually runs at 100 TB: the corpus's
MinHash signatures are computed ONCE (and in production the banded
index is kept partitioned by ``(band, bucket)``); each arriving batch
is shingled, signed, and equi-joined against the stored signature
frame. Per-batch work is the batch-side signing plus a narrow banding
map over the stored signatures and the banded join — the corpus text
is never re-shingled or re-signed. ``foreachBatch`` reuses the batch
operator (``minhash_lsh_join``) verbatim, so batch and streaming
screening are the same code path with the same semantics.

No reference analogue (the reference has no streaming; SURVEY.md
§2.9) — training-data extension surface.
"""

from __future__ import annotations

import datetime
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_dedup_against_corpus(
    stream_df: DataFrame,
    corpus_df: DataFrame,
    sink: Callable[[DataFrame, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    min_est_jaccard: float = 0.5,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Run ``minhash_lsh_join(batch, corpus)`` per micro-batch and hand
    the flagged (left_id, right_id, est_jaccard) frame to ``sink``.

    The corpus MinHash signatures are computed once up front and
    localCheckpointed; each micro-batch passes them via
    ``right_signatures``, so per-batch work is shingling + signing
    the BATCH plus the banded equi-join against the stored signature
    frame — proportional to the batch, never the corpus. With
    ``available_now=True`` the query drains pending input and stops
    (backfill pattern); without it, it runs continuously.
    """
    from diseasystore_spark.pipeline.dedup import (
        minhash_lsh_join,
        minhash_signatures,
    )

    # Sign the corpus ONCE; localCheckpoint materializes the signature
    # frame so every micro-batch plan starts from the stored
    # (id, sig) rows — the corpus text is never re-shingled.
    corpus_sigs = minhash_signatures(
        corpus_df.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        n=n,
    ).localCheckpoint()

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        flagged = minhash_lsh_join(
            batch_df,
            None,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            n=n,
            min_est_jaccard=min_est_jaccard,
            right_signatures=corpus_sigs,
        )
        sink(flagged, epoch_id)

    writer = stream_df.writeStream.foreachBatch(handle_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_into_store(
    stream_df: DataFrame,
    corpus_df: DataFrame,
    backend,
    table_id: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    min_est_jaccard: float = 0.5,
    valid_from: datetime.date = datetime.date(2024, 1, 1),
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming contamination sink: screen each micro-batch against
    the (once-signed) corpus and persist the flagged documents as SCD2
    feature rows — the full streaming -> store path, mirroring what
    ``test_sessionize_stream_into_scd2_store`` does for sessions.

    Each flagged pair lands as ``(key_doc, key_match, est_jaccard,
    valid_from, valid_until=NULL)`` — an open-ended "document is
    contaminated by corpus member" fact. Batches merge through
    ``stream_feature_updates(mode="append")`` (insert-only,
    ``close_absent=False``): a pair's absence from a later batch says
    nothing, so nothing closes; rows ACCUMULATE across micro-batches,
    each at its own deterministic epoch-derived ``slice_ts``, so
    ``get_table(slice_ts=τ)`` replays the flagged set as of any point
    in the ingest timeline (snapshot isolation between batches).
    """
    from diseasystore_spark.pipeline.dedup import (
        minhash_lsh_join,
        minhash_signatures,
    )
    from diseasystore_spark.streaming.ingest import stream_feature_updates

    corpus_sigs = minhash_signatures(
        corpus_df.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        n=n,
    ).localCheckpoint()

    def transform(batch_df: DataFrame) -> DataFrame:
        flagged = minhash_lsh_join(
            batch_df,
            None,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            n=n,
            min_est_jaccard=min_est_jaccard,
            right_signatures=corpus_sigs,
        )
        return flagged.select(
            F.col("left_id").cast("string").alias("key_doc"),
            F.col("right_id").cast("string").alias("key_match"),
            F.col("est_jaccard").cast("double").alias("est_jaccard"),
            F.lit(valid_from).alias("valid_from"),
            F.lit(None).cast("date").alias("valid_until"),
        )

    return stream_feature_updates(
        stream_df,
        backend,
        table_id,
        transform=transform,
        checkpoint_dir=checkpoint_dir,
        available_now=available_now,
        mode="append",
    )


def stream_decontaminate_against_benchmark(
    stream_df: DataFrame,
    benchmark_df: DataFrame,
    sink: Callable[[DataFrame, int], None],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming exact-n-gram benchmark screening: run
    ``ngram_decontaminate(batch, benchmark)`` per micro-batch and hand
    the (id, n_shared_ngrams, contaminated) frame to ``sink``.

    The benchmark's distinct hashed n-gram keys are computed ONCE up
    front and localCheckpointed (``benchmark_ngram_keys``); every
    micro-batch broadcasts that stored key set — per-batch work is
    shingling the BATCH plus one broadcast join, proportional to the
    batch, never the benchmark."""
    from diseasystore_spark.pipeline.dedup import (
        benchmark_ngram_keys,
        ngram_decontaminate,
    )

    bench_keys = benchmark_ngram_keys(
        benchmark_df.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        n=n,
    ).localCheckpoint()

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        flagged = ngram_decontaminate(
            batch_df,
            None,
            id_col=id_col,
            text_col=text_col,
            n=n,
            benchmark_keys=bench_keys,
        )
        sink(flagged, epoch_id)

    writer = stream_df.writeStream.foreachBatch(handle_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_exact_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key stream dedup via the engine-native
    ``dropDuplicatesWithinWatermark`` — the right primitive when the
    at-least-once upstream (Kafka replays, retried producers) can
    re-deliver the same record within a bounded interval.

    State holds one entry per distinct key seen within the watermark
    horizon and is evicted as event time advances — bounded by
    key-rate × watermark, never by stream length (the reason NOT to
    use plain ``dropDuplicates`` on a stream: its state grows
    forever). Duplicates arriving farther apart than the watermark
    are NOT collapsed — that is the documented trade; use the
    signature-index path (``stream_dedup_against_corpus``) when the
    dedup horizon is the whole corpus.

    Works on batch frames too (falls back to plain dropDuplicates
    semantics over the batch), which the stream==batch test uses.
    """
    if not keys:
        raise ValueError("keys must name at least one column")
    out = events.withWatermark(ts_col, watermark)
    if events.isStreaming:
        return out.dropDuplicatesWithinWatermark(keys)
    return out.dropDuplicates(keys)
