from diseasystore_spark.storage.scd2 import ParquetFeatureStore, normalize_slice_ts

__all__ = ["ParquetFeatureStore", "normalize_slice_ts"]
