from .schemas import (
    LINKS_SCHEMA,
    MOVIES_SCHEMA,
    RATINGS_SCHEMA,
    SPLIT_5COL_SCHEMA,
    TAGS_SCHEMA,
    TESTDATA_TABLES,
)
from .pandas_compat import from_pandas, read_csv_pandas, to_pandas
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
    "from_pandas",
    "read_csv_pandas",
    "to_pandas",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_ratings_csv",
    "read_testdata",
    "write_csv",
    "write_parquet",
    "write_partitioned",
]
