"""ML featurization queries: the hashing trick and smoothed target
encoding — the tabular-feature companions of the text/embedding
pipeline operators (each oracle-checked).

Both are single-aggregate shapes that survive any scale: feature
hashing maps an unbounded categorical space onto a fixed bucket space
with an engine-neutral md5 hash (no vocabulary state at all), and
target encoding reduces each category to exact-DECIMAL sufficient
statistics before one double-precision smoothing formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import hash_bucket
from . import _t, register

# raw 64-bit md5 key (first 8 hex chars) — the DuckDB mirror of
# functions.hashing.md5_long(feat, salt='fh')
_FH_LONG = (
    "CAST(('0x' || substr(md5(concat_ws(chr(1), 'fh', feat)), 1, 8)) AS BIGINT)"
)


@register(
    "part_feature_hashing",
    oracle=f"""
WITH f AS (
  SELECT p_partkey,
         unnest(['brand=' || p_brand,
                 'type=' || p_type,
                 'size=' || CAST(p_size AS VARCHAR)]) AS feat
  FROM part),
b AS (SELECT feat, CAST({_FH_LONG} % 64 AS INT) AS bucket FROM f)
SELECT bucket,
       count(*) AS n_rows,
       count(DISTINCT feat) AS n_feats,
       min(feat) AS example_feat
FROM b GROUP BY bucket ORDER BY bucket
""",
)
def q_part_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: every part's categorical features
    (brand/type/size as 'name=value' strings) map to a fixed 64-bucket
    index via functions.hashing.hash_bucket (md5 % 64 — engine-neutral,
    vocabulary-free).  Output is the bucket occupancy histogram with
    per-bucket distinct-feature counts — n_feats > 1 rows ARE the hash
    collisions, measured rather than assumed away.  Scale shape: one
    narrow explode (3 features/row) + one hash aggregate over <= 64
    groups; no vocabulary table exists at any corpus size — that is the
    point of the trick."""
    part = _t(spark, sf_dir, "part")
    f = part.select(
        F.explode(
            F.array(
                F.concat(F.lit("brand="), "p_brand"),
                F.concat(F.lit("type="), "p_type"),
                F.concat(F.lit("size="), F.col("p_size").cast("string")),
            )
        ).alias("feat")
    )
    return (
        f.withColumn("bucket", hash_bucket(64, "feat", salt="fh"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("feat").alias("n_feats"),
            F.min("feat").alias("example_feat"),
        )
        .orderBy("bucket")
    )


@register(
    "brand_target_encoding",
    oracle="""
WITH g AS (
  SELECT p.p_brand,
         count(*) AS n,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS s
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1),
gm AS (
  SELECT CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS gmean FROM g)
SELECT p_brand, n,
       round((CAST(s AS DOUBLE) + 25.0 * gmean) / (n + 25.0), 6)
         AS enc_price
FROM g, gm
ORDER BY p_brand
""",
)
def q_brand_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean target encoding of the part brand against line-item
    price: enc = (sum_target + m*global_mean) / (n + m), m=25 — the
    leak-resistant categorical encoder of tabular ML pipelines (rare
    categories shrink toward the prior).  Sufficient statistics are
    exact DECIMAL sums per category (one map-side-combinable
    aggregate); the global prior re-enters as a broadcast one-row
    aggregate (no driver collect) and a single double-precision formula
    written identically on both engines."""
    from ..operators.relational import with_scalars

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    g = j.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
    )
    gm = g.agg(
        (
            F.sum("s").cast("double") / F.sum("n").cast("double")
        ).alias("gmean")
    )
    return (
        with_scalars(g, gm)
        .select(
            "p_brand",
            "n",
            F.round(
                (F.col("s").cast("double") + 25.0 * F.col("gmean"))
                / (F.col("n") + 25.0),
                6,
            ).alias("enc_price"),
        )
        .orderBy("p_brand")
    )


def _pca_oracle(n_iter: int = 8, dim: int = 64) -> str:
    """Unrolled replay of operators/pca.power_iteration_top_pc: every
    iteration's integer sums, power-of-two floor rescale, and IEEE
    max-normalization spelled out per step (generated, like the BPE and
    pagerank oracles).  Every CTE is MATERIALIZED: DuckDB inlines
    multiply-referenced CTEs by default, which duplicates the iteration
    subtree per reference — 2^n_iter plan copies — and turns a 0.2 s
    replay into minutes."""
    blocks = [
        f"""
base AS MATERIALIZED (SELECT vec_id AS id,
                list_transform(embedding,
                               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                                         AS BIGINT)) AS xm
         FROM embeddings),
ex AS MATERIALIZED (SELECT id, unnest(range(0, len(xm))) AS dim, unnest(xm) AS x FROM base),
v0 AS MATERIALIZED (SELECT unnest(range(0, {dim})) AS dim, CAST(1048576 AS BIGINT) AS vq)"""
    ]
    for k in range(1, n_iter + 1):
        p = k - 1
        blocks.append(f"""
dots{k} AS MATERIALIZED (SELECT id, CAST(sum(x * vq) AS BIGINT) AS dot
            FROM ex JOIN v{p} USING (dim) GROUP BY id),
d{k} AS MATERIALIZED (SELECT id, CAST(floor(dot / 67108864.0) AS BIGINT) AS d FROM dots{k}),
y{k} AS MATERIALIZED (SELECT dim, CAST(sum(x * d) AS BIGINT) AS y
         FROM ex JOIN d{k} USING (id) GROUP BY dim),
m{k} AS MATERIALIZED (SELECT CAST(max(abs(y)) AS DOUBLE) AS m FROM y{k}),
v{k} AS MATERIALIZED (SELECT dim, CAST(floor(CAST(y AS DOUBLE) / m * 1048576 + 0.5) AS BIGINT)
                AS vq
         FROM y{k}, m{k})""")
    v = f"v{n_iter}"
    return f"""WITH {','.join(blocks)},
fin AS MATERIALIZED (SELECT id, CAST(sum(x * vq) AS BIGINT) AS dotf
        FROM ex JOIN {v} USING (dim) GROUP BY id),
num AS MATERIALIZED (SELECT sum(CAST(dotf AS HUGEINT) * dotf) AS num FROM fin),
den AS MATERIALIZED (SELECT CAST(sum(vq * vq) AS BIGINT) AS den FROM {v}),
ssq AS MATERIALIZED (SELECT CAST(sum(x * x) AS BIGINT) AS ssq FROM ex)
SELECT dim, vq AS v_q,
       (floor((CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 1000000000000.0)
              * 1000000 + 0.5) / 1000000) AS lambda_r6,
       (floor((CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / CAST(ssq AS DOUBLE))
              * 1000000 + 0.5) / 1000000) AS evr_r6
FROM {v}, num, den, ssq ORDER BY dim"""


@register("embedding_top_pc_power", oracle=_pca_oracle(8, 64))
def q_embedding_top_pc_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by 8 rounds of
    distributed power iteration (operators/pca.py) — iterative linear
    algebra under a full value-hash gate: micro-unit integers, exact
    BIGINT dots, power-of-two floor rescales and IEEE-deterministic
    max-normalization make every engine produce the bit-identical
    iterate.  On a flat spectrum (near-isotropic synthetic embeddings)
    the fixed-iteration output is a high-Rayleigh direction rather than
    the fully converged eigenvector — the eigenvalue and
    explained-variance columns report exactly how much variance it
    captures, and the hash gates that computation too."""
    from ..operators.pca import power_iteration_top_pc

    emb = _t(spark, sf_dir, "embeddings")
    return power_iteration_top_pc(emb, "vec_id", "embedding", dim=64, n_iter=8)


@register(
    "lineitem_feature_scaling",
    oracle="""
WITH stats AS (
  SELECT l_returnflag,
         count(*) AS n,
         min(l_quantity) AS q_min, max(l_quantity) AS q_max,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS p_sum,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS p_sumsq
  FROM lineitem GROUP BY 1),
s2 AS (
  SELECT l_returnflag, n, q_min, q_max,
         p_sum / n AS p_mean,
         sqrt((p_sumsq - p_sum * p_sum / n) / (n - 1)) AS p_std
  FROM stats)
SELECT l.l_orderkey, l.l_partkey, l.l_linenumber, l.l_returnflag,
       (floor((CASE WHEN s.q_max > s.q_min
               THEN (l.l_quantity - s.q_min) / (s.q_max - s.q_min)
               ELSE 0.0 END) * 1000000 + 0.5) / 1000000) AS qty_minmax_r6,
       (floor((CASE WHEN s.p_std > 0
               THEN (l.l_extendedprice - s.p_mean) / s.p_std
               ELSE 0.0 END) * 1000000 + 0.5) / 1000000) AS price_z_r6
FROM lineitem l JOIN s2 s USING (l_returnflag)
ORDER BY l.l_orderkey, l.l_partkey, l.l_linenumber
""",
)
def q_lineitem_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature normalization — min-max scaling of quantity and
    z-scoring of price within each return-flag group, the standard
    tabular-ML preprocessing pass.  Group sufficient statistics (count,
    min/max, exact-DECIMAL sum and sum-of-squares) reduce in ONE
    map-side-combinable aggregate over <= |groups| rows, broadcast back
    onto the fact scan — no window, no second shuffle of the data.  The
    mean/std/scale formulas are written identically on both engines
    over identical exact inputs, so every scaled row det-rounds to the
    same value."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    stats = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.min("l_quantity").alias("q_min"),
        F.max("l_quantity").alias("q_max"),
        F.sum(p).cast("double").alias("p_sum"),
        F.sum(p * p).cast("double").alias("p_sumsq"),
    )
    s2 = stats.select(
        "l_returnflag",
        "q_min",
        "q_max",
        (F.col("p_sum") / F.col("n")).alias("p_mean"),
        F.sqrt(
            (F.col("p_sumsq") - F.col("p_sum") * F.col("p_sum") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("p_std"),
    )
    p6 = float(10**6)

    def r6(c):
        return F.floor(c * p6 + F.lit(0.5)) / p6

    return (
        li.join(F.broadcast(s2), "l_returnflag")
        .select(
            "l_orderkey",
            "l_partkey",
            "l_linenumber",
            "l_returnflag",
            r6(
                F.when(
                    F.col("q_max") > F.col("q_min"),
                    (F.col("l_quantity") - F.col("q_min"))
                    / (F.col("q_max") - F.col("q_min")),
                ).otherwise(0.0)
            ).alias("qty_minmax_r6"),
            r6(
                F.when(
                    F.col("p_std") > 0,
                    (F.col("l_extendedprice") - F.col("p_mean")) / F.col("p_std"),
                ).otherwise(0.0)
            ).alias("price_z_r6"),
        )
        .orderBy("l_orderkey", "l_partkey", "l_linenumber")
    )


@register(
    "grouped_price_trimmed_mean_arrow",
    oracle="""
WITH c AS (
  SELECT l_returnflag AS g,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM lineitem),
r AS (
  SELECT g, cents,
         row_number() OVER (PARTITION BY g ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM c),
k AS (SELECT g, n, CAST(floor(0.1 * n) AS BIGINT) AS k FROM r GROUP BY g, n),
kept AS (
  SELECT r.g, r.cents, k.n, k.k
  FROM r JOIN k USING (g) WHERE r.rn > k.k AND r.rn <= k.n - k.k)
SELECT g AS l_returnflag,
       CAST(max(n) AS BIGINT) AS n,
       CAST(max(k) AS BIGINT) AS n_trimmed_each,
       (floor((CAST(sum(cents) AS DOUBLE) / count(*) / 100.0)
              * 1000000 + 0.5) / 1000000) AS trimmed_mean_r6
FROM kept GROUP BY g ORDER BY l_returnflag
""",
)
def q_grouped_price_trimmed_mean_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean of price per return flag through the Arrow
    grouped-map path (operators/arrowops.py) — the robust-aggregation
    companion of the exact-median op, completing the sanctioned-Python
    surface under a value-hash gate.  Inside the worker: integer-cents
    conversion, total-order slice, exact int64 sum, one double division
    — so the pandas computation hashes identically against the SQL
    window-rank oracle (boundary ties have equal cents, so either cut
    yields the same kept multiset)."""
    from ..operators.arrowops import grouped_trimmed_mean_arrow

    li = _t(spark, sf_dir, "lineitem")
    return grouped_trimmed_mean_arrow(
        li, "l_returnflag", "l_extendedprice", trim=0.1
    ).orderBy("l_returnflag")


def _psi_oracle() -> str:
    """Generated PSI oracle: 10 bins pivoted into fixed columns so the
    PSI sum is an explicit left-to-right expression — aggregate-order
    nondeterminism cannot exist."""
    crs = ",\n".join(
        f"  CAST(sum(CASE WHEN bin = {i} AND is_ref THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS cr{i},\n"
        f"  CAST(sum(CASE WHEN bin = {i} AND NOT is_ref THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS cc{i}"
        for i in range(10)
    )
    nr = " + ".join(f"cr{i}" for i in range(10))
    nc = " + ".join(f"cc{i}" for i in range(10))
    terms = ",\n".join(
        f"  ((cr{i} + 0.5) / (nr + 5.0) - (cc{i} + 0.5) / (nc + 5.0))"
        f" * ln(((cr{i} + 0.5) / (nr + 5.0)) / ((cc{i} + 0.5) / (nc + 5.0))) AS t{i}"
        for i in range(10)
    )
    tsum = " + ".join(f"t{i}" for i in range(10))
    tmax = "greatest(" + ", ".join(f"t{i}" for i in range(10)) + ")"
    argmax = "CASE " + " ".join(
        f"WHEN t{i} >= {tmax} THEN {i}" for i in range(10)
    ) + " END"
    return f"""
WITH c AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         (o_orderdate < TIMESTAMP '2000-01-01') AS is_ref
  FROM orders),
b AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c),
binned AS (
  SELECT ((cents - lo) * 10) // (hi - lo + 1) AS bin, is_ref FROM c, b),
piv AS (
  SELECT
{crs}
  FROM binned),
tot AS (SELECT *, {nr} AS nr, {nc} AS nc FROM piv),
tm AS (SELECT *,
{terms}
  FROM tot)
SELECT nr AS n_ref, nc AS n_cur,
       (floor(({tsum}) * 1000000 + 0.5) / 1000000) AS psi_r6,
       (floor(({tmax}) * 1000000 + 0.5) / 1000000) AS max_term_r6,
       {argmax} AS top_drift_bin
FROM tm"""


@register("order_price_drift_psi", oracle=_psi_oracle())
def q_order_price_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between historical (pre-2000) and
    recent order prices — the standard ML-monitoring drift score.  10
    equal-width bins over integer cents (bounds from ONE broadcast
    min/max row; integer bin arithmetic), continuity-corrected
    p/q = (c + 0.5)/(N + 5), and — the determinism trick — the bins
    PIVOT into fixed columns so the PSI total is an explicit
    left-to-right 10-term expression and the hottest bin comes from
    greatest(): no SUM over floats anywhere, so the score is
    bit-identical on any engine or partitioning."""
    orders = _t(spark, sf_dir, "orders")
    c = orders.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")).alias("is_ref"),
    )
    b = c.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    binned = c.crossJoin(F.broadcast(b)).select(
        F.expr("((cents - lo) * 10) DIV (hi - lo + 1)").alias("bin"), "is_ref"
    )
    piv = binned.agg(
        *[
            x
            for i in range(10)
            for x in (
                F.sum(F.when((F.col("bin") == i) & F.col("is_ref"), 1).otherwise(0))
                .cast("long")
                .alias(f"cr{i}"),
                F.sum(F.when((F.col("bin") == i) & ~F.col("is_ref"), 1).otherwise(0))
                .cast("long")
                .alias(f"cc{i}"),
            )
        ]
    )
    nr = sum((F.col(f"cr{i}") for i in range(1, 10)), F.col("cr0"))
    nc = sum((F.col(f"cc{i}") for i in range(1, 10)), F.col("cc0"))
    tot = piv.withColumn("nr", nr).withColumn("nc", nc)

    def term(i):
        p = (F.col(f"cr{i}") + 0.5) / (F.col("nr") + 5.0)
        q = (F.col(f"cc{i}") + 0.5) / (F.col("nc") + 5.0)
        return ((p - q) * F.log(p / q)).alias(f"t{i}")

    tm = tot.select("nr", "nc", *[term(i) for i in range(10)])
    tsum = sum((F.col(f"t{i}") for i in range(1, 10)), F.col("t0"))
    tmax = F.greatest(*[F.col(f"t{i}") for i in range(10)])
    argmax = F.coalesce(
        *[F.when(F.col(f"t{i}") >= tmax, F.lit(i)) for i in range(10)]
    )
    p6 = float(10**6)
    return tm.select(
        F.col("nr").alias("n_ref"),
        F.col("nc").alias("n_cur"),
        (F.floor(tsum * p6 + F.lit(0.5)) / p6).alias("psi_r6"),
        (F.floor(tmax * p6 + F.lit(0.5)) / p6).alias("max_term_r6"),
        argmax.alias("top_drift_bin"),
    )
