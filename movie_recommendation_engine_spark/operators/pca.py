"""Distributed PCA: top principal direction by power iteration.

The dimensionality-reduction / embedding-whitening step of an ML data
pipeline, run as deterministic distributed linear algebra: v_{t+1} ∝
Xᵀ(X·v_t) over the uncentered data matrix (the leading right singular
vector; X·Xᵀ is PSD, so the iterate's sign direction is stable).

Exactness contract (what makes an ITERATIVE float algorithm
value-hash-checkable across engines — the pagerank trick applied to
linear algebra):

- embedding components convert once to integer micro-units
  floor(x·1e6) (the engine-wide exact-arithmetic convention, cf.
  jl_project / centroid_classifier_eval);
- every per-row dot product is an exact BIGINT sum;
- the per-row rescale divides by 2^26 — a POWER OF TWO, so the double
  division is exact (exponent shift) and its floor is engine-identical;
- the per-iteration normalization divides the 64 exact BIGINT
  accumulator values by their max |·| in IEEE doubles (both inputs
  < 2^53, division deterministic) and re-quantizes to the 2^20 grid
  with floor(r·2^20 + 0.5) — identical on any engine;
- eigenvalue + explained-variance-ratio come from exact integer /
  DECIMAL sums with ONE double conversion at the end, det-rounded.

Scale shape: one explode of the vectors (localCheckpointed — reused by
every iteration), and per iteration one broadcast join against the
64-row v table + two hash aggregates.  No driver collect anywhere; the
v state that crosses iterations is 64 rows.

Magnitude bounds (documented, not assumed): |x| < 1.05 keeps every
PER-ROW intermediate within BIGINT; the cross-corpus accumulators
(per-dim y, num, ssq) are DECIMAL(38,0) — exact at any realistic
corpus size (a BIGINT ssq would overflow at ~131k 64-dim vectors).
The normalization inputs stay within 2^53 up to ~1e7 rows; for a
larger corpus raise the 2^26 shift — the dial is the ``row_shift``
argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MICRO = 1_000_000
VSCALE = 1 << 20  # 1048576: the quantization grid of the iterate
ROW_SHIFT = 1 << 26  # 67108864: per-row dot rescale (power of two)


def power_iteration_top_pc(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = 8,
    row_shift: int = ROW_SHIFT,
) -> DataFrame:
    """Top principal direction of the (uncentered) embedding matrix.

    Returns one row per dimension: (dim, v_q) with v_q the quantized
    eigenvector component on the ±2^20 grid, plus the Rayleigh-quotient
    eigenvalue estimate and explained-variance ratio (constant across
    rows, det-rounded to 6 dp).
    """
    spark = vecs.sparkSession
    xm = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * MICRO).cast("long")
    )
    ex = (
        vecs.select(F.col(id_col).alias("id"), F.posexplode(xm).alias("dim", "x"))
        .localCheckpoint(eager=False)
    )
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("dim"),
        F.lit(VSCALE).cast("long").alias("vq"),
    )
    for _ in range(n_iter):
        dots = (
            ex.join(F.broadcast(v), "dim")
            .groupBy("id")
            .agg(F.sum(F.col("x") * F.col("vq")).alias("dot"))
        )
        d = dots.select(
            "id", F.floor(F.col("dot") / float(row_shift)).cast("long").alias("d")
        )
        y = (
            ex.join(d, "id")
            .groupBy("dim")
            # per-term product fits BIGINT (~1.1e12) but the cross-corpus
            # SUM does not past ~8e6 rows — accumulate in DECIMAL(38,0)
            # (exact, overflow-safe to 38 digits) like `num` below
            .agg(F.sum((F.col("x") * F.col("d")).cast("decimal(38,0)")).alias("y"))
        )
        m = y.agg(F.max(F.abs("y")).cast("double").alias("m"))
        v = (
            y.crossJoin(F.broadcast(m))
            .select(
                "dim",
                # try_divide: an all-zero data matrix gives m = 0, which
                # under Spark 4's default ANSI mode would RAISE here;
                # the degenerate matrix instead yields NULL components
                # (found by the degenerate-input probe suite)
                F.floor(
                    F.try_divide(F.col("y").cast("double"), F.col("m")) * VSCALE
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("vq"),
            )
            .localCheckpoint(eager=False)
        )

    # Rayleigh quotient λ = Σ(x·v)² / Σv² (in micro² units) and
    # explained-variance share λ / Σ‖x‖² — exact sums, one double step
    fin = (
        ex.join(F.broadcast(v), "dim")
        .groupBy("id")
        .agg(F.sum(F.col("x") * F.col("vq")).alias("dotf"))
    )
    num = fin.agg(
        F.sum(F.col("dotf").cast("decimal(38,0)") * F.col("dotf")).alias("num")
    )
    den = v.agg(F.sum(F.col("vq") * F.col("vq")).alias("den"))
    # x*x is ~1.1e12 per term: a BIGINT sum overflows (ANSI raise) at
    # ~131k 64-dim vectors, far below the documented ~1e7-row bound —
    # DECIMAL(38,0) keeps the sum exact at any realistic corpus size
    ssq = ex.agg(F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("ssq"))
    lam = F.col("num").cast("double") / F.col("den").cast("double")
    p6 = float(10**6)

    def r6(c):
        return F.floor(c * p6 + F.lit(0.5)) / p6

    return (
        v.crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(ssq))
        .select(
            "dim",
            F.col("vq").alias("v_q"),
            r6(lam / float(MICRO) ** 2).alias("lambda_r6"),
            r6(lam / F.col("ssq").cast("double")).alias("evr_r6"),
        )
        .orderBy("dim")
    )
