from diseasystore_spark.sources.csv import read_csv_source
from diseasystore_spark.sources.helpers import (
    fuzzy_date_match,
    parse_diseasyconn,
    source_conn_github,
    source_conn_path,
)

__all__ = [
    "fuzzy_date_match",
    "parse_diseasyconn",
    "read_csv_source",
    "source_conn_github",
    "source_conn_path",
]
