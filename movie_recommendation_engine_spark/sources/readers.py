"""Schema'd sources (SURVEY §2.1 S1-S6).

Reference behavior reproduced, Spark-first:
- S1/S2 header & headerless CSV scans (reference als.py:24,
  popularity_model.py:43) -> ``read_csv`` with an explicit StructType so
  types land at the scan instead of post-hoc casts.
- S3 positional naming (``toDF(...)``) is subsumed by schema-at-read.
- S6 Parquet-first storage (the reference only ever *intended* this —
  split_script.py:16-17 comment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .schemas import RATINGS_SCHEMA, TESTDATA_TABLES


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with a declared schema (no inferSchema pass)."""
    return spark.read.options(header=str(header).lower(), **options).schema(schema).csv(path)


def read_ratings_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """The reference's core source: ratings CSV (als.py:24-26)."""
    return read_csv(spark, path, RATINGS_SCHEMA, header=header)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — vectorized, with predicate pushdown into stripe/row-
    group indexes (same scan-pruning contract as parquet)."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str, wholetext: bool = False) -> DataFrame:
    """Raw-text scan: one row per line (column ``value``), the source
    for log-parsing pipelines — parse structure out with
    regexp_extract/split downstream, keep the scan itself schema-free.
    ``wholetext=True`` reads each file as ONE row instead (small-doc
    corpora where file boundary == document boundary)."""
    return spark.read.option("wholetext", str(wholetext).lower()).text(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines scan.  Malformed-row policy via ``mode``:
    PERMISSIVE (default) nulls bad rows — add a ``_corrupt_record``
    string field to the schema to quarantine the raw text;
    DROPMALFORMED silently drops; FAILFAST aborts the job.  At scale,
    quarantine-and-count beats failing a 100 TB job on row 3."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md).

    ``events.ts`` has been written two ways across driver testdata
    generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    reader rejects — read it as a long via the legacy conf and convert)
    and plain TIMESTAMP(MICROS) (reads natively).  Handle both by
    checking the landed dtype.  When converting, the ns->µs step MUST be
    integer division (``ts DIV 1000``): dividing the int64 nanosecond
    value as a double loses precision past the 53-bit mantissa (ulp ≈
    256 ns at 2024 epochs), landing ~12% of rows on the wrong
    microsecond vs DuckDB's exact integer truncation.
    """
    if table not in TESTDATA_TABLES:
        raise ValueError(f"unknown testdata table {table!r}; know {TESTDATA_TABLES}")
    if table == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table as a dict and register temp views."""
    out: dict[str, DataFrame] = {}
    for t in TESTDATA_TABLES:
        df = read_testdata(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        out[t] = df
    return out
