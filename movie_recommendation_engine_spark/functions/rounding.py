"""Deterministic cross-engine rounding.

Engine-native ``round(x, 6)`` on DOUBLE is NOT portable at ties: Spark
routes through Java BigDecimal HALF_UP on the double's exact decimal
expansion, DuckDB through a scaled multiply — and INTEGER RATIOS hit
ties systematically, not just by luck: a/2^k in double is binary-exact
with a terminating decimal expansion whose last digit is 5 (e.g. any
odd/128 = 0.xxxxxx5 at the 7th place), so round-to-6 of a Jaccard with
|union| = 128 is ALWAYS a boundary case.  Caught live on
tpch_q2_min_cost_supplier at sf0.1 (price/2^k quantities).

``det_round`` rounds as ``floor(x * 10^s + 0.5) / 10^s`` — multiply,
add, floor, divide are each single IEEE double ops, bit-identical in
any engine.  (Half-ties round toward +inf, which differs from HALF_UP
for negative inputs — acceptable: the convention is consistent across
engines, which is the property the value-hash gate needs.)  The DuckDB
mirror is ``duck_det_round6`` in the registry.

Use this wherever the rounded value is a ratio of integers (Jaccard,
token fractions, rates); decimal-derived sums can keep round(x, 6),
whose inputs have short decimal expansions with no hidden 7th digit.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def det_round(col: Column, scale: int = 6) -> Column:
    p = float(10**scale)
    return F.floor(col * p + F.lit(0.5)) / p
