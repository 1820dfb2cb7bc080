from diseasystore_spark.streaming.dedup_stream import (
    stream_dedup_against_corpus,
)
from diseasystore_spark.streaming.ingest import (
    stream_feature_updates,
    windowed_event_counts,
)
from diseasystore_spark.streaming.quantiles import stream_windowed_quantiles
from diseasystore_spark.streaming.topk import stream_windowed_topk

__all__ = [
    "stream_dedup_against_corpus",
    "stream_feature_updates",
    "stream_windowed_quantiles",
    "stream_windowed_topk",
    "windowed_event_counts",
]
