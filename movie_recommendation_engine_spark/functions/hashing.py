"""Deterministic, engine-portable hashing primitives.

Why md5 and not ``F.rand`` / ``F.xxhash64``:

- ``F.rand(seed)`` is *partition-dependent* — the same row gets a
  different draw if the partitioning changes (SURVEY §7.3), which makes
  samples non-reproducible across cluster sizes.  A content hash of the
  row key is partitioning-independent: the split a row lands in is a pure
  function of its key, at 4 cores or 4000.
- md5 is implemented identically everywhere (Spark, DuckDB, Python), so
  every sampling/split operator built on it is oracle-checkable with
  plain ANSI SQL.  xxhash64/murmur3 seeds differ across engines.

``uniform_hash`` maps arbitrary key columns to a double in [0, 1):
the first 8 hex digits of md5(concat_ws(...)) as an unsigned 32-bit int,
divided by 2^32.  Uniformity is inherited from md5; 2^32 buckets is
plenty for fraction comparisons.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Separator for multi-column keys — MUST equal the oracle SQL's chr(1).
# Written as the escape "\x01" (not a raw control byte) so editors/diff
# tooling can't silently strip it and break hash parity everywhere.
_SEP = "\x01"
_TWO_32 = float(2**32)


def md5_long(*cols: Column | str, salt: str = "") -> Column:
    """First 32 bits of md5 over the concatenated key, as a long.

    Equivalent DuckDB SQL (salt prepended as the first concat_ws arg;
    the separator is chr(1) so it cannot collide with real data):
        CAST(('0x' || substr(md5(concat_ws(chr(1), cols...)), 1, 8)) AS BIGINT)

    Key columns should be string/integer typed — float/timestamp
    renderings differ across engines.

    NULL hazard (pinned in tests/test_null_semantics.py): concat_ws
    SKIPS NULL arguments, so ('x', NULL), (NULL, 'x') and the
    single-column key ('x',) all produce the SAME hash, and an
    all-NULL key hashes as the empty string.  Coalesce nullable key
    columns before hashing; every registry key is non-null by
    construction.
    """
    key = F.concat_ws(_SEP, *[F.col(c) if isinstance(c, str) else c for c in cols])
    if salt:
        key = F.concat_ws(_SEP, F.lit(salt), key)
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def md5_long60(*cols: Column | str, salt: str = "") -> Column:
    """First 60 bits of md5 over the concatenated key, as a long — the
    WIDE variant of ``md5_long`` for fingerprints whose collision
    statistics must survive large corpora (a 32-bit SimHash produces
    chance Hamming-<=k collisions quadratically in corpus size; 60 bits
    pushes that below one expected pair at any realistic n).  60 and
    not 64 because both engines parse the hex prefix into a SIGNED
    64-bit integer: 15 hex chars is the widest prefix that can never
    overflow it.

    Equivalent DuckDB SQL:
        CAST(('0x' || substr(md5(concat_ws(chr(1), cols...)), 1, 15)) AS BIGINT)

    Same NULL-skipping concat_ws hazard as ``md5_long``.
    """
    key = F.concat_ws(_SEP, *[F.col(c) if isinstance(c, str) else c for c in cols])
    if salt:
        key = F.concat_ws(_SEP, F.lit(salt), key)
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def uniform_hash(*cols: Column | str, salt: str = "") -> Column:
    """Deterministic pseudo-uniform double in [0,1) from key columns."""
    return (md5_long(*cols, salt=salt) / F.lit(_TWO_32)).cast("double")


def hash_bucket(n_buckets: int, *cols: Column | str, salt: str = "") -> Column:
    """Deterministic bucket id in [0, n_buckets)."""
    return (md5_long(*cols, salt=salt) % F.lit(n_buckets)).cast("int")


def char_shingles(col: Column | str, n: int = 5, lowercase: bool = True) -> Column:
    """Distinct character n-grams of a string column -> array<string>.

    JVM-side only: sequence + transform + substring; no Python UDF.
    Whitespace is collapsed first so formatting doesn't change the
    shingle set.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(F.trim(c), r"\s+", " ")
    if lowercase:
        s = F.lower(s)
    # zip_with chain over shifted slices of the char array, NOT
    # transform(sequence, i -> s.substr(i, n)): expressions inside an
    # HOF lambda re-evaluate per element, so the substr spelling re-ran
    # the normalization regexp once per character (4.6x slower at
    # sf0.01) — same pitfall as word_shingles above
    chars = F.split(s, "")
    size = F.size(chars)
    chain = chars
    for k in range(1, n):
        chain = F.zip_with(
            chain, F.slice(chars, k + 1, size), lambda a, b: F.concat(a, b)
        )
    grams = F.filter(chain, lambda x: x.isNotNull())
    return F.when(size >= n, F.array_distinct(grams)).otherwise(F.array(s))


def word_shingles(col: Column | str, n: int = 3, lowercase: bool = True) -> Column:
    """Distinct word n-grams -> array<string> (space-joined); fewer than
    n words collapse to one (short) whole-text shingle.

    Built as a zip_with chain over n-1 shifted slices of the word array
    rather than ``transform(sequence(...), i -> slice(words, i+1, n))``:
    expressions referenced inside a higher-order-function lambda are
    re-evaluated PER ELEMENT (no hoisting/CSE inside lambdas), so the
    transform spelling re-runs the regexp split and array build once per
    shingle position — measured 8.2 s vs 1.1 s over sf0.1 documents.
    The slices here are lambda-free arguments, evaluated once per row;
    zip_with null-pads the shorter side, and the null-propagating
    ``concat`` turns the ragged tail into nulls the filter drops.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(F.trim(c), r"\s+", " ")
    if lowercase:
        s = F.lower(s)
    words = F.split(s, " ")
    size = F.size(words)
    chain = words
    for k in range(1, n):
        chain = F.zip_with(
            chain,
            F.slice(words, k + 1, size),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    grams = F.filter(chain, lambda x: x.isNotNull())
    return F.when(size >= n, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", words))
    )
