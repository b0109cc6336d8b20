"""Pandas-interop source/sink (SURVEY §2.1 S5).

The reference ingests CSVs *driver-locally with pandas* in two places —
the replacement splitter (reference new_split_script.py:4,
``pd.read_csv('ratings.csv')``) and the LightFM comparison harness
(reference extension.py:129-132) — then keeps working on the pandas
frame.  The engine is Spark-native, so the equivalent surface is an
explicit **interop boundary**, not a parallel pandas pipeline:

- ``read_csv_pandas``: pandas parse on the driver, normalized to the
  SAME explicit StructType the native scan uses, shipped to executors
  via Arrow ``createDataFrame``.  Output is schema- and value-identical
  to ``readers.read_csv`` on the same file (tested), so a reference
  user can swap their ``pd.read_csv`` call in and continue with engine
  operators unchanged.
- ``from_pandas`` / ``to_pandas``: the Arrow-batched conversion pair
  for the single-machine edges of a pipeline (small dim tables in,
  model-comparison frames out — the extension.py boundary).

Scale contract: these are DRIVER-LOCAL paths.  ``read_csv_pandas``
materializes the whole file in driver memory and is for dim tables and
local dev only — a 100 TB fact table goes through ``readers.read_csv``
(distributed scan, schema-at-read, predicate pushdown).  ``to_pandas``
takes an optional ``max_rows`` guard so an accidental collect of a fact
table fails fast instead of OOMing the driver.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Spark integral type -> value range; cells outside it (or with a
# fractional part) land NULL under the native scan's PERMISSIVE parse
_INT_BOUNDS: dict[type, tuple[int, int]] = {
    T.ByteType: (-(2**7), 2**7 - 1),
    T.ShortType: (-(2**15), 2**15 - 1),
    T.IntegerType: (-(2**31), 2**31 - 1),
    T.LongType: (-(2**63), 2**63 - 1),
}

# Spark scalar type -> pandas NULLABLE extension dtype.  The nullable
# dtypes matter: plain numpy int64 silently becomes float64 the moment a
# CSV cell is empty, which would flip the landed Spark type; extension
# dtypes keep missing cells as <NA> and Arrow maps them to SQL NULL.
_PANDAS_DTYPE: dict[type, str] = {
    T.ByteType: "Int8",
    T.ShortType: "Int16",
    T.IntegerType: "Int32",
    T.LongType: "Int64",
    T.FloatType: "Float32",
    T.DoubleType: "Float64",
    T.BooleanType: "boolean",
    T.StringType: "string",
}


def _ensure_arrow(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def _normalize(pdf: pd.DataFrame, schema: T.StructType) -> pd.DataFrame:
    """Project + cast a pandas frame to exactly ``schema``'s columns and
    the nullable dtypes that Arrow-convert to the schema's Spark types."""
    out = pd.DataFrame(index=pdf.index)
    for field in schema.fields:
        if field.name not in pdf.columns:
            raise ValueError(
                f"pandas frame is missing column {field.name!r}; has {list(pdf.columns)}"
            )
        dtype = _PANDAS_DTYPE.get(type(field.dataType))
        if dtype is None:
            raise TypeError(
                f"unsupported interop type {field.dataType} for column "
                f"{field.name!r}; supported: {sorted(t.__name__ for t in _PANDAS_DTYPE)}"
            )
        out[field.name] = pdf[field.name].astype(dtype)
    return out


def from_pandas(
    spark: SparkSession, pdf: pd.DataFrame, schema: T.StructType
) -> DataFrame:
    """Arrow-batched pandas -> Spark conversion under an explicit schema.

    The declared StructType keeps the landed types independent of
    pandas' inference (a frame that happens to hold only ints in a
    float column still lands as the declared type), so downstream joins
    against native-scanned tables never hit a type-mismatch cast.
    """
    _ensure_arrow(spark)
    return spark.createDataFrame(_normalize(pdf, schema), schema=schema)


def read_csv_pandas(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """S5: the reference's ``pd.read_csv`` ingestion, landing as a Spark
    DataFrame identical to ``readers.read_csv(spark, path, schema,
    header)`` (reference new_split_script.py:4, extension.py:129-132).

    Driver-local by design — see the module docstring's scale contract.
    Columns bind POSITIONALLY, exactly like the native scan: Spark's
    CSV source with a user schema ignores header names entirely
    (``enforceSchema`` default — the header row is only skipped), takes
    the first ``len(schema)`` tokens, and null-fills short rows.  So:
    parse with NO name binding (``names=`` on a wider file would shift
    leading columns into the index), skip the header row if present,
    truncate extra columns, null-pad missing ones, then rename by
    position (SURVEY §2.1 S2/S3, same contract as the native scan).
    """
    names = [f.name for f in schema.fields]
    try:
        # dtype=str: NO pandas inference — a StringType column holding
        # '007' or '1.50' must keep its raw text exactly like the native
        # scan (inference would land 7 / 1.5); typed columns are
        # converted per-field below instead
        pdf = pd.read_csv(path, header=None, skiprows=1 if header else 0, dtype=str)
    except pd.errors.EmptyDataError:
        # header-only or empty file: the native scan lands 0 rows
        pdf = pd.DataFrame(columns=range(len(names)))
    pdf = pdf.iloc[:, : len(names)]
    for i in range(pdf.shape[1], len(names)):
        pdf[i] = pd.NA
    pdf.columns = names
    for field in schema.fields:
        s = pdf[field.name]
        if isinstance(field.dataType, T.BooleanType):
            pdf[field.name] = s.str.lower().map({"true": True, "false": False})
        elif not isinstance(field.dataType, T.StringType):
            # PERMISSIVE null-on-malformed, like the native scan: 'abc'
            # in a numeric column lands NULL, and so do '4.5' or an
            # out-of-range literal in an INTEGRAL column (Spark's CSV
            # parser rejects both; the old strict to_numeric raised
            # instead — round-5 advice).  Strict parse first so a clean
            # long column keeps exact int64 (coerce's float64 fallback
            # loses precision past 2^53 — documented interop caveat for
            # malformed-containing long columns).
            try:
                v = pd.to_numeric(s)
            except (ValueError, TypeError):
                v = pd.to_numeric(s, errors="coerce")
            bounds = _INT_BOUNDS.get(type(field.dataType))
            if bounds is not None:
                lo, hi = bounds
                v = v.where((v % 1 == 0) & (v >= lo) & (v <= hi))
            pdf[field.name] = v
    # Spark file scans land every field nullable regardless of the
    # declared StructType (FileSourceStrategy's asNullable contract);
    # mirror that so the two paths are schema-identical.
    landed = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in schema.fields]
    )
    return from_pandas(spark, pdf, landed)


def to_pandas(df: DataFrame, max_rows: Optional[int] = None) -> pd.DataFrame:
    """Arrow-batched Spark -> pandas collect for single-machine edges
    (the reference extension's model-comparison boundary,
    extension.py:129-142).

    ``max_rows`` fails fast (with the observed count) before collecting
    when the result exceeds the driver's intended budget — ``limit(n+1)``
    bounds the probe so the check itself never scans past the cap.
    """
    _ensure_arrow(df.sparkSession)
    if max_rows is not None:
        probe = df.limit(max_rows + 1).count()
        if probe > max_rows:
            raise ValueError(
                f"to_pandas guard: result exceeds max_rows={max_rows}; "
                "aggregate or sample before collecting"
            )
    return df.toPandas()
