"""Streaming incremental deduplication: screen document micro-batches
against a static reference corpus.

This is how near-dup screening actually runs at 100 TB: the corpus's
LSH band index is built ONCE (and in production kept partitioned by
``(band, bucket)``); each arriving batch is banded the same way and
equi-joined against the index — per-batch cost is proportional to the
batch, never the corpus. ``foreachBatch`` reuses the batch operator
(``minhash_lsh_join``) verbatim, so batch and streaming screening are
the same code path with the same semantics.

No reference analogue (the reference has no streaming; SURVEY.md
§2.9) — training-data extension surface.
"""

from __future__ import annotations

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

    The corpus band index is computed once up front and cached —
    per-batch work re-reads the cached index, not the corpus. With
    ``available_now=True`` the query drains pending input and stops
    (backfill pattern); without it, it runs continuously.
    """
    from diseasystore_spark.pipeline.dedup import minhash_lsh_pairs  # noqa: F401
    from diseasystore_spark.pipeline.dedup import minhash_lsh_join

    # Materialize the corpus once; localCheckpoint severs lineage so
    # every micro-batch plan starts from the stored signatures.
    corpus_cached = corpus_df.select(id_col, text_col).localCheckpoint()

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        flagged = minhash_lsh_join(
            batch_df,
            corpus_cached,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            n=n,
            min_est_jaccard=min_est_jaccard,
        )
        sink(flagged, epoch_id)

    writer = stream_df.writeStream.foreachBatch(handle_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
