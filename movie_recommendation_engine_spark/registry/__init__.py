"""Query registry: every implemented operator from SURVEY §2 as a
(spark_query, duckdb_oracle_sql) pair over the driver testdata star
schema (TESTDATA.md).

Conventions that make the driver's order-insensitive value-hash robust:
- every computed double is ``round(x, 6)`` on BOTH sides (float sums
  accumulate in different orders across engines; 6 decimals absorbs the
  ulp noise while keeping full semantic precision); money sums go
  through DECIMAL(38,2) first so the sum itself is exact;
- every aggregate/computed column is aliased identically on both sides;
- arrays in outputs are sorted (sort_array / list_sort) so content is
  order-canonical;
- timestamps in outputs are rendered 'yyyy-MM-dd HH:mm:ss' strings on
  both sides;
- sampling/split queries share the md5 content-hash construction
  (functions.hashing) which is bit-identical in DuckDB SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import read_testdata

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame query; optionally its
    DuckDB oracle SQL (omitted => driver runs the weaker rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_testdata(spark, sf_dir, name)


def duck_hash_sql(salt: str, *cols: str) -> str:
    """DuckDB expression bit-identical to functions.hashing.uniform_hash."""
    parts = ", ".join(cols)
    prefix = f"'{salt}', " if salt else ""
    return (
        "(CAST(('0x' || substr(md5(concat_ws(chr(1), "
        f"{prefix}{parts})), 1, 8)) AS BIGINT) / 4294967296.0)"
    )


# Import query groups for their registration side effects.
from . import core  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import ml  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import breadth  # noqa: E402,F401

from .core import flagship  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register", "flagship", "duck_hash_sql"]
