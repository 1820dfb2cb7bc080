from diseasystore_spark.streaming.dedup_stream import (
    stream_dedup_against_corpus,
)
from diseasystore_spark.streaming.ingest import (
    stream_feature_updates,
    windowed_event_counts,
)

__all__ = [
    "stream_dedup_against_corpus",
    "stream_feature_updates",
    "windowed_event_counts",
]
