from diseasystore_spark.streaming.ingest import (
    stream_feature_updates,
    windowed_event_counts,
)

__all__ = ["stream_feature_updates", "windowed_event_counts"]
