from .schemas import (
    LINKS_SCHEMA,
    MOVIES_SCHEMA,
    RATINGS_SCHEMA,
    SPLIT_5COL_SCHEMA,
    TAGS_SCHEMA,
    TESTDATA_TABLES,
)
from .readers import (
    read_csv,
    read_json,
    read_parquet,
    read_ratings_csv,
    read_testdata,
)
from .writers import write_csv, write_parquet, write_partitioned

__all__ = [
    "RATINGS_SCHEMA",
    "MOVIES_SCHEMA",
    "TAGS_SCHEMA",
    "LINKS_SCHEMA",
    "SPLIT_5COL_SCHEMA",
    "TESTDATA_TABLES",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_ratings_csv",
    "read_testdata",
    "write_csv",
    "write_parquet",
    "write_partitioned",
]
