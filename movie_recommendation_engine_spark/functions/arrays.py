"""Array / string column helpers (SURVEY §2.9 implied surface).

All JVM-side higher-order functions — no Python UDFs.  ``dot_product``
and ``cosine_similarity`` are the building blocks of the similarity
search operators; ``split_genres`` / ``title_year`` are the standard
MovieLens preprocessing the dataset README defines
(ml-latest-small_readme:109-111) but the reference never implemented.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns, JVM-side.

    zip_with multiplies elementwise; aggregate folds the sum in array
    order (deterministic, so results are reproducible bit-for-bit).
    """
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0-norm vectors yield NULL.

    ``try_divide`` not ``/``: Spark 4 runs ANSI mode by default, where
    a plain division RAISES on a zero denominator instead of returning
    NULL — the randomized property (test_properties_exactness10) caught
    exactly that on the all-zeros vector.
    """
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))


def split_genres(genres: Column | str) -> Column:
    """Pipe-delimited genre string -> array<string> (SURVEY §1.2)."""
    return F.split(_c(genres), r"\|")


def title_year(title: Column | str) -> Column:
    """Extract the trailing '(YYYY)' release year from a MovieLens title."""
    y = F.regexp_extract(_c(title), r"\((\d{4})\)\s*$", 1)
    return F.when(y == "", None).otherwise(y).cast("int")
