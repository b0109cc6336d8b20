"""Advanced-analytics queries: market-basket association rules, RFM
customer segmentation, revenue-concentration (Gini / top-decile share),
a chi-square independence test, information-gain feature ranking,
seasonal-naive forecast backtest, per-customer window-function features,
exact-median MAD outliers, repeat-purchase survival, hash-based negative
sampling, classical trend/seasonal/residual decomposition, ABC (Pareto)
classification, and an A/B two-proportion z-test readout.

These extend the engine past the reference's recommender workload
(reference scope: als.py / popularity_model.py) into the classic
OLAP-on-a-warehouse analytics a Spark user expects, each expressed with
the repo-wide determinism conventions: exact integer/DECIMAL sums,
window-free global ranks (operators.relational.global_rank), fixed-arity
explicit expressions instead of float SUMs, and det_round6 on every
computed double.

Scale notes are per-query; the shared principle is that every shuffle
key space here is either bounded by a vocabulary (brands, priorities,
calendar months) or is the natural dimension key (custkey), and every
scalar re-enters via a broadcast one-row aggregate, never a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.rounding import det_round
from . import _t, duck_det_round6, register


# --------------------------------------------------------------------------
# Market-basket association rules (brand level)
# --------------------------------------------------------------------------


@register(
    "basket_association_rules",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
nb AS (SELECT brand, count(*) AS n_brand FROM items GROUP BY brand),
tot AS (SELECT count(DISTINCT okey) AS n_baskets FROM items),
pairs AS (
  SELECT a.brand AS antecedent, b.brand AS consequent, count(*) AS n_ab
  FROM items a JOIN items b ON a.okey = b.okey AND a.brand <> b.brand
  GROUP BY a.brand, b.brand),
rules AS (
  SELECT p.antecedent, p.consequent, p.n_ab,
         na.n_brand AS n_a, nc.n_brand AS n_b, t.n_baskets
  FROM pairs p
  JOIN nb na ON p.antecedent = na.brand
  JOIN nb nc ON p.consequent = nc.brand
  CROSS JOIN tot t)
SELECT antecedent, consequent, n_ab, n_a, n_b, n_baskets,
       {duck_det_round6("CAST(n_ab AS DOUBLE) / n_a")} AS conf_r6,
       (n_ab * n_baskets * 1000000) // (n_a * n_b) AS lift_ppm
FROM rules
WHERE n_ab * 200 >= n_baskets
ORDER BY lift_ppm DESC, antecedent, consequent
""",
)
def q_basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules brand_a -> brand_b over order baskets: support
    count, confidence, and lift, min-support 0.5% of baskets.

    Scale shape: the basket table dedupes to DISTINCT (orderkey, brand)
    FIRST and is checkpointed once for all four consumers; the pair
    self-join exchanges that slim table on orderkey, and the rule space
    is bounded by the brand vocabulary squared (|brands|^2, never row
    count), so the pair aggregate's key space stays tiny.  Brand
    marginals and the basket total ride in as broadcast joins.  Lift is
    ranked as an exact integer (parts-per-million via BIGINT DIV —
    n_ab * N * 1e6 fits int64 through sf1; beyond that move the product
    into DECIMAL(38,0)), so ordering never depends on float ties."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    # localCheckpoint: the deduped basket table is computed ONCE and read
    # by four consumers (both pair-join sides, brand marginals, total).
    # The checkpoint scan reports UnknownPartitioning, so the self-join
    # re-exchanges on okey at scale (AQE broadcasts it at gate sizes) —
    # two exchanges over the slim (okey, brand) table, never a recompute
    # of the lineitem-part dedup.
    items = items.localCheckpoint()
    nb = items.groupBy("brand").agg(F.count("*").alias("n_brand"))
    tot = items.agg(F.countDistinct("okey").alias("n_baskets"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.brand") != F.col("b.brand")))
        .groupBy(
            F.col("a.brand").alias("antecedent"), F.col("b.brand").alias("consequent")
        )
        .agg(F.count("*").alias("n_ab"))
    )
    rules = (
        pairs.join(
            F.broadcast(nb.withColumnRenamed("brand", "antecedent").withColumnRenamed("n_brand", "n_a")),
            "antecedent",
        )
        .join(
            F.broadcast(nb.withColumnRenamed("brand", "consequent").withColumnRenamed("n_brand", "n_b")),
            "consequent",
        )
        .crossJoin(F.broadcast(tot))
    )
    return (
        rules.filter(F.col("n_ab") * 200 >= F.col("n_baskets"))
        .select(
            "antecedent",
            "consequent",
            "n_ab",
            "n_a",
            "n_b",
            "n_baskets",
            det_round(F.col("n_ab").cast("double") / F.col("n_a")).alias("conf_r6"),
            F.expr("(n_ab * n_baskets * 1000000) DIV (n_a * n_b)").alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "antecedent", "consequent")
    )


# --------------------------------------------------------------------------
# RFM customer segmentation (window-free quintiles)
# --------------------------------------------------------------------------

_RFM_SCORE = "(((rnk - 1) * 5) // n) + 1"


@register(
    "customer_rfm_segments",
    oracle=f"""
WITH m AS (
  SELECT o_custkey AS custkey,
         date_diff('day', max(o_orderdate),
                   (SELECT max(o_orderdate) FROM orders)) AS r_days,
         count(*) AS n_orders,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS m_cents
  FROM orders GROUP BY o_custkey),
n1 AS (SELECT count(*) AS n FROM m),
rr AS (SELECT custkey, row_number() OVER (ORDER BY r_days, custkey) AS rnk FROM m),
fr AS (SELECT custkey, row_number() OVER (ORDER BY n_orders, custkey) AS rnk FROM m),
mr AS (SELECT custkey, row_number() OVER (ORDER BY m_cents, custkey) AS rnk FROM m),
s AS (
  SELECT m.custkey, m.r_days, m.n_orders, m.m_cents,
         6 - ({_RFM_SCORE.replace('rnk', 'rr.rnk')}) AS r_score,
         {_RFM_SCORE.replace('rnk', 'fr.rnk')} AS f_score,
         {_RFM_SCORE.replace('rnk', 'mr.rnk')} AS m_score
  FROM m
  JOIN rr ON m.custkey = rr.custkey
  JOIN fr ON m.custkey = fr.custkey
  JOIN mr ON m.custkey = mr.custkey
  CROSS JOIN n1)
SELECT custkey, r_days, n_orders, m_cents, r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS segment
FROM s ORDER BY custkey
""",
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every ordering customer scored 1-5 on Recency /
    Frequency / Monetary quintiles, concatenated into the classic
    3-digit segment label.

    Quintiles come from the window-free global_rank assembly (range
    partition + triangular offsets — no single-partition WindowExec),
    one rank per metric with custkey as total-order tiebreak, and the
    bucket is the explicit integer formula floor((rnk-1)*5/n)+1, so
    boundary assignment is identical on any engine or partitioning (the
    oracle runs the textbook row_number() windows the engine avoids).
    Recency inverts (6 - bucket) so 5 always means best.  Customer-level
    metrics are one hash aggregate over orders; the anchor date and n
    re-enter as broadcast one-row aggregates."""
    from ..operators.relational import global_rank, with_scalars

    orders = _t(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("__anchor"))
    m = (
        with_scalars(orders, anchor)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.max("__anchor"), F.max("o_orderdate")).alias("r_days"),
            F.count("*").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("m_cents"),
        )
        .localCheckpoint()  # 3 rank consumers + the final join read one scan
    )
    n1 = m.agg(F.count("*").alias("n"))

    def ranked(order_col: str, out: str) -> DataFrame:
        return global_rank(
            m.select("custkey", order_col), [order_col, "custkey"], rank_col="rnk"
        ).select("custkey", F.col("rnk").alias(out))

    def score(rnk: str, invert: bool):
        s = F.expr(f"((({rnk} - 1) * 5) DIV n) + 1")
        return (6 - s) if invert else s

    # the three quintile ranks join FIRST and the one-row n crosses in
    # ONCE at the end — the r13 plan replayed an identical count-over-m
    # aggregate subtree (BNLJ + HashAggregate tower) inside each of the
    # three branches (lines 17/48/79 of the 612-line before-dump);
    # computing the scores after the custkey join needs a single
    # broadcast of a single aggregate (guide §2.4 compute once, reuse)
    return (
        with_scalars(
            m.join(ranked("r_days", "r_rnk"), "custkey")
            .join(ranked("n_orders", "f_rnk"), "custkey")
            .join(ranked("m_cents", "m_rnk"), "custkey"),
            n1,
        )
        .select(
            "custkey",
            "r_days",
            "n_orders",
            "m_cents",
            score("r_rnk", True).alias("r_score"),
            score("f_rnk", False).alias("f_score"),
            score("m_rnk", False).alias("m_score"),
        )
        .select(
            "custkey",
            "r_days",
            "n_orders",
            "m_cents",
            "r_score",
            "f_score",
            "m_score",
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ).alias("segment"),
        )
        .orderBy("custkey")
    )


# --------------------------------------------------------------------------
# Revenue concentration: Gini coefficient + top-decile share
# --------------------------------------------------------------------------


@register(
    "customer_revenue_gini",
    oracle=f"""
WITH x AS (
  SELECT o_custkey AS custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey),
r AS (SELECT custkey, cents,
             row_number() OVER (ORDER BY cents, custkey) AS rnk
      FROM x),
n1 AS (SELECT count(*) AS n FROM r),
s AS (SELECT max(n) AS n,
             CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS total,
             CAST(sum(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS total_cents,
             CAST(sum(CAST(rnk * cents AS DECIMAL(38,0))) AS DOUBLE) AS wsum,
             CAST(sum(CASE WHEN rnk > n - (n // 10)
                           THEN CAST(cents AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE)
               AS top_sum
      FROM r CROSS JOIN n1)
SELECT n AS n_customers, total_cents,
       {duck_det_round6("(2.0 * wsum) / (n * total) - (n + 1.0) / n")} AS gini_r6,
       {duck_det_round6("top_sum / total")} AS top10_share_r6
FROM s
""",
)
def q_customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration audit: Gini coefficient and top-decile
    revenue share over per-customer order totals.

    Gini uses the sorted-rank identity G = 2*sum(i*x_i)/(n*sum(x)) -
    (n+1)/n with ranks from the window-free global_rank; both weighted
    and plain sums accumulate as exact DECIMAL(38,0) over integer cents
    (rnk*cents fits int64 per term; the SUM is where 100-TB overflow
    lives, hence DECIMAL), so the only float ops are the two final
    divisions — bit-identical cross-engine under det_round6.  The
    top-decile cut reuses the same rank (rnk > n - n DIV 10): no second
    sort, no percentile sketch."""
    from ..operators.relational import global_rank, with_scalars

    orders = _t(spark, sf_dir, "orders")
    x = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("cents")
    )
    r = global_rank(x, ["cents", "custkey"], rank_col="rnk")
    n1 = r.agg(F.count("*").alias("n"))
    s = (
        with_scalars(r, n1)
        .agg(
            F.max("n").alias("n"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("total_dec"),
            F.sum((F.col("rnk") * F.col("cents")).cast("decimal(38,0)")).alias("wsum_dec"),
            F.sum(
                F.when(
                    F.col("rnk") > F.col("n") - F.expr("n DIV 10"),
                    F.col("cents").cast("decimal(38,0)"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias("top_dec"),
        )
    )
    total = F.col("total_dec").cast("double")
    wsum = F.col("wsum_dec").cast("double")
    top = F.col("top_dec").cast("double")
    n = F.col("n")
    return s.select(
        n.alias("n_customers"),
        F.col("total_dec").cast("long").alias("total_cents"),
        det_round((2.0 * wsum) / (n * total) - (n + 1.0) / n).alias("gini_r6"),
        det_round(top / total).alias("top10_share_r6"),
    )


# --------------------------------------------------------------------------
# Chi-square test of independence (return flag x order priority)
# --------------------------------------------------------------------------


@register(
    "returnflag_priority_chi2",
    oracle=f"""
WITH obs AS (
  SELECT l.l_returnflag AS flag, o.o_orderpriority AS priority,
         count(*) AS observed
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_returnflag, o.o_orderpriority),
rt AS (SELECT flag, CAST(sum(observed) AS BIGINT) AS row_total FROM obs GROUP BY flag),
ct AS (SELECT priority, CAST(sum(observed) AS BIGINT) AS col_total FROM obs GROUP BY priority),
tt AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs)
SELECT obs.flag, obs.priority, obs.observed, rt.row_total, ct.col_total,
       {duck_det_round6("CAST(rt.row_total * ct.col_total AS DOUBLE) / tt.n")}
         AS expected_r6,
       {duck_det_round6(
           "pow(CAST(obs.observed * tt.n - rt.row_total * ct.col_total AS DOUBLE), 2)"
           " / (CAST(tt.n AS DOUBLE) * rt.row_total * ct.col_total)"
       )} AS contrib_r6
FROM obs JOIN rt ON obs.flag = rt.flag
         JOIN ct ON obs.priority = ct.priority
         CROSS JOIN tt
ORDER BY obs.flag, obs.priority
""",
)
def q_returnflag_priority_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between return flag and order
    priority — per-cell observed vs expected counts and the chi-square
    contribution, over the 3x5 contingency table.

    Determinism: the contribution is computed from the ALGEBRAIC
    identity (O - E)^2/E = (O*N - rt*ct)^2 / (N*rt*ct) so the numerator
    difference stays an exact BIGINT before the single double pow and
    division — no float subtraction of near-equal numbers, no float SUM
    anywhere (per-cell rows ARE the output; a consumer sums the
    contributions if it wants the statistic).  Marginals are
    vocabulary-sized aggregates that broadcast back onto the 15-row cell
    table; the only data-sized work is one fact-scan aggregate."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    obs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("observed"))
        .localCheckpoint()  # 4 consumers (marginals, total, final) — one pass
    )
    rt = obs.groupBy("flag").agg(F.sum("observed").cast("long").alias("row_total"))
    ct = obs.groupBy("priority").agg(F.sum("observed").cast("long").alias("col_total"))
    tt = obs.agg(F.sum("observed").cast("long").alias("n"))
    j = (
        obs.join(F.broadcast(rt), "flag")
        .join(F.broadcast(ct), "priority")
        .crossJoin(F.broadcast(tt))
    )
    num = (F.col("observed") * F.col("n") - F.col("row_total") * F.col("col_total")).cast(
        "double"
    )
    den = F.col("n").cast("double") * F.col("row_total") * F.col("col_total")
    return j.select(
        "flag",
        "priority",
        "observed",
        "row_total",
        "col_total",
        det_round(
            (F.col("row_total") * F.col("col_total")).cast("double") / F.col("n")
        ).alias("expected_r6"),
        det_round(F.pow(num, F.lit(2)) / den).alias("contrib_r6"),
    ).orderBy("flag", "priority")


# --------------------------------------------------------------------------
# Information gain of a categorical feature (brand -> return flag)
# --------------------------------------------------------------------------

_IG_TERM = (
    "CASE WHEN {c} = 0 THEN 0.0 "
    "ELSE -(CAST({c} AS DOUBLE) / n_rows) * ln(CAST({c} AS DOUBLE) / n_rows) END"
)


@register(
    "brand_return_info_gain",
    oracle=f"""
WITH piv AS (
  SELECT p.p_brand AS brand,
         count(*) AS n_rows,
         CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_r,
         CAST(sum(CASE WHEN l.l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         CAST(sum(CASE WHEN l.l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_n
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand)
SELECT brand, n_rows, cnt_r, cnt_a, cnt_n,
       {duck_det_round6(
           _IG_TERM.format(c="cnt_r") + " + " + _IG_TERM.format(c="cnt_a")
           + " + " + _IG_TERM.format(c="cnt_n")
       )} AS h_cond_r6
FROM piv ORDER BY brand
""",
)
def q_brand_return_info_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand conditional entropy of the return flag — the
    feature-selection primitive (information gain = H(class) - sum over
    brands of p(brand)*H(class|brand); the per-brand rows carry
    everything a consumer needs to finish that sum exactly).

    The class vocabulary is FIXED (3 flags), so the per-brand class
    histogram pivots into 3 columns in ONE map-side-combinable aggregate
    and the entropy is an explicit 3-term left-to-right expression —
    the PSI determinism pattern: no float SUM whose order could differ
    between engines, zero-count classes short-circuit to 0 before ln.
    The only data-sized work is the single fact-scan aggregate; brands
    are a bounded vocabulary."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    piv = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_rows"),
            *[
                F.sum(F.when(F.col("l_returnflag") == flag, 1).otherwise(0))
                .cast("long")
                .alias(f"cnt_{flag.lower()}")
                for flag in ("R", "A", "N")
            ],
        )
    )

    def term(c: str):
        p = F.col(c).cast("double") / F.col("n_rows")
        return F.when(F.col(c) == 0, F.lit(0.0)).otherwise(-p * F.log(p))

    h = term("cnt_r") + term("cnt_a") + term("cnt_n")
    return piv.select(
        "brand", "n_rows", "cnt_r", "cnt_a", "cnt_n", det_round(h).alias("h_cond_r6")
    ).orderBy("brand")


# --------------------------------------------------------------------------
# Seasonal-naive forecast backtest (lag-12 months, join-based — no window)
# --------------------------------------------------------------------------


@register(
    "monthly_seasonal_forecast",
    oracle=f"""
WITH m AS (
  SELECT CAST(year(o_orderdate) * 12 + (month(o_orderdate) - 1) AS BIGINT) AS mi,
         strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS actual_cents
  FROM orders GROUP BY 1, 2)
SELECT cur.month, cur.actual_cents,
       prev.actual_cents AS forecast_cents,
       abs(cur.actual_cents - prev.actual_cents) AS ae_cents,
       {duck_det_round6(
           "CAST(abs(cur.actual_cents - prev.actual_cents) AS DOUBLE)"
           " / cur.actual_cents"
       )} AS ape_r6
FROM m cur JOIN m prev ON cur.mi = prev.mi + 12
ORDER BY cur.month
""",
)
def q_monthly_seasonal_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each month's order
    revenue as the same month last year, and score the absolute /
    percentage error per month.

    The lag-12 lookup is a SELF-JOIN on an integer month index
    (year*12 + month-1 = mi; forecast month joins mi = mi+12) — no
    ordered window at all, so there is nothing to single-partition even
    in principle, and the joined table is calendar-sized (months, not
    rows): it broadcasts.  Monthly revenue is one fact-scan aggregate
    into exact integer cents, errors are exact BIGINT differences, and
    the only double is the final APE division under det_round6."""
    orders = _t(spark, sf_dir, "orders")
    m = (
        orders.groupBy(
            (F.year("o_orderdate") * 12 + (F.month("o_orderdate") - 1))
            .cast("long")
            .alias("mi"),
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM").alias(
                "month"
            ),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("actual_cents")
        )
        .localCheckpoint()  # both sides of the lag join read one aggregate
    )
    cur, prev = m.alias("cur"), m.alias("prev")
    ae = F.abs(F.col("cur.actual_cents") - F.col("prev.actual_cents"))
    return (
        cur.join(F.broadcast(prev), F.col("cur.mi") == F.col("prev.mi") + 12)
        .select(
            F.col("cur.month").alias("month"),
            F.col("cur.actual_cents").alias("actual_cents"),
            F.col("prev.actual_cents").alias("forecast_cents"),
            ae.alias("ae_cents"),
            det_round(ae.cast("double") / F.col("cur.actual_cents")).alias("ape_r6"),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# Window-function breadth: per-customer order-history features
# --------------------------------------------------------------------------


@register(
    "customer_order_history_features",
    oracle=f"""
WITH o AS (
  SELECT o_custkey AS custkey, o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderdate
  FROM orders),
w AS (
  SELECT custkey, o_orderkey, cents,
         row_number() OVER pc AS seq,
         count(*) OVER (PARTITION BY custkey) AS n_orders,
         first_value(cents) OVER pc AS first_cents,
         last_value(cents) OVER (pc ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING) AS last_cents,
         nth_value(cents, 3) OVER (pc ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS third_cents,
         cume_dist() OVER pc AS cume,
         date_diff('day', o_orderdate,
                   lead(o_orderdate) OVER pc) AS next_gap_days
  FROM o
  WINDOW pc AS (PARTITION BY custkey ORDER BY o_orderdate, o_orderkey))
SELECT custkey, o_orderkey, cents, seq, n_orders, first_cents, last_cents,
       third_cents,
       {duck_det_round6("cume")} AS cume_r6,
       next_gap_days
FROM w ORDER BY custkey, seq
""",
)
def q_customer_order_history_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-history feature block: sequence number, first /
    last / third order value, cumulative-distribution position, and the
    gap to the next order — the window-function breadth query
    (row_number, count, first_value, last_value, nth_value, cume_dist,
    lead in ONE pass).

    All windows partition by custkey — per-key state, embarrassingly
    parallel at any scale, never the single-partition global window this
    repo bans.  The (o_orderdate, o_orderkey) ordering is a total order,
    so cume_dist = seq/n is tie-free and engine-independent; frames for
    last/nth are explicit UNBOUNDED FOLLOWING on both engines."""
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        "o_orderdate",
    )
    pc = W.partitionBy("custkey").orderBy("o_orderdate", "o_orderkey")
    full = pc.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        o.select(
            "custkey",
            "o_orderkey",
            "cents",
            F.row_number().over(pc).alias("seq"),
            F.count("*").over(W.partitionBy("custkey")).alias("n_orders"),
            F.first("cents").over(pc).alias("first_cents"),
            F.last("cents").over(full).alias("last_cents"),
            F.nth_value("cents", 3).over(full).alias("third_cents"),
            det_round(F.cume_dist().over(pc)).alias("cume_r6"),
            F.datediff(F.lead("o_orderdate").over(pc), F.col("o_orderdate")).alias(
                "next_gap_days"
            ),
        )
        .orderBy("custkey", "seq")
    )


# --------------------------------------------------------------------------
# Robust outlier detection: exact-median MAD with integer thresholds
# --------------------------------------------------------------------------


@register(
    "order_price_mad_outliers",
    oracle=f"""
WITH c AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
n1 AS (SELECT count(*) AS n FROM c),
r AS (SELECT o_orderkey, cents,
             row_number() OVER (ORDER BY cents, o_orderkey) AS rnk
      FROM c),
med AS (
  SELECT CAST(sum(CASE WHEN rnk = (n + 1) // 2 THEN cents ELSE 0 END)
            + sum(CASE WHEN rnk = (n + 2) // 2 THEN cents ELSE 0 END) AS BIGINT)
           AS med2
  FROM r CROSS JOIN n1),
d AS (SELECT o_orderkey, cents, abs(2 * cents - med2) AS dev2
      FROM c CROSS JOIN med),
dr AS (SELECT o_orderkey, dev2,
              row_number() OVER (ORDER BY dev2, o_orderkey) AS rnk
       FROM d),
mad AS (
  SELECT CAST(sum(CASE WHEN rnk = (n + 1) // 2 THEN dev2 ELSE 0 END)
            + sum(CASE WHEN rnk = (n + 2) // 2 THEN dev2 ELSE 0 END) AS BIGINT)
           AS mad4
  FROM dr CROSS JOIN n1)
SELECT n1.n AS n_orders, med.med2 AS median_cents_x2, mad.mad4 AS mad_cents_x4,
       CAST((SELECT count(*) FROM d CROSS JOIN mad
             WHERE 40000 * dev2 > 103782 * mad4) AS BIGINT) AS n_outliers,
       (SELECT min(o_orderkey) FROM d
        WHERE dev2 = (SELECT max(dev2) FROM d)) AS top_outlier_key,
       {duck_det_round6(
           "(SELECT 2.0 * max(dev2) FROM d) / (1.4826 * mad.mad4)"
       )} AS top_robust_z_r6
FROM n1 CROSS JOIN med CROSS JOIN mad
""",
)
def q_order_price_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen over order prices: exact-median MAD with the
    3.5-sigma Iglewicz-Hoaglin cut, everything integer until one final
    display division.

    Both medians are EXACT (no sketch): rank via the window-free
    global_rank, central element(s) selected by rank so the doubled
    median med2 = x[(n+1)/2] + x[(n+2)/2] stays a BIGINT for odd and
    even n alike; deviations dev2 = |2*cents - med2| and the doubled-MAD
    mad4 repeat the construction.  The outlier predicate is the CROSS-
    MULTIPLIED integer inequality 40000*dev2 > 103782*mad4 (= robust z
    = 2*dev2/(1.4826*mad4) > 3.5 with 1.4826 = 14826/10000 cleared of
    all division) — so the outlier COUNT cannot flip on a float boundary
    on any engine.  Two rank assemblies = two range exchanges over the
    data; every scalar re-enters broadcast."""
    from ..operators.relational import global_rank, with_scalars

    orders = _t(spark, sf_dir, "orders")
    # c feeds n1, the first median rank, and d; n1/med are one-row
    # scalars each crossed in at several places — checkpoint all of them
    # so the r13 plan's 14 scalar BNLJ crosses stop replaying the orders
    # scan + aggregate per use (guide §2.4 compute once, reuse; round-13
    # verdict task 6)
    c = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)
    n1 = c.agg(F.count("*").alias("n")).localCheckpoint(eager=False)

    def doubled_median(df: DataFrame, col: str) -> DataFrame:
        r = global_rank(df, [col, "o_orderkey"], rank_col="rnk")
        lo = F.sum(F.when(F.col("rnk") == F.expr("(n + 1) DIV 2"), F.col(col)).otherwise(0))
        hi = F.sum(F.when(F.col("rnk") == F.expr("(n + 2) DIV 2"), F.col(col)).otherwise(0))
        return with_scalars(r, n1).agg((lo + hi).cast("long").alias("m2"))

    med = (
        doubled_median(c, "cents")
        .withColumnRenamed("m2", "med2")
        .localCheckpoint(eager=False)  # crossed into d AND the final row
    )
    d = with_scalars(c, med).select(
        "o_orderkey", "cents", F.abs(2 * F.col("cents") - F.col("med2")).alias("dev2")
    ).localCheckpoint()  # consumed by MAD rank, outlier count, and top-row probe
    mad = doubled_median(d.select("o_orderkey", "dev2"), "dev2").withColumnRenamed(
        "m2", "mad4"
    )
    dm = with_scalars(d, F.broadcast(mad).crossJoin(n1).crossJoin(med))
    agg = dm.agg(
        F.max("n").alias("n_orders"),
        F.max("med2").alias("median_cents_x2"),
        F.max("mad4").alias("mad_cents_x4"),
        F.sum(
            F.when(40000 * F.col("dev2") > 103782 * F.col("mad4"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
        # max deviation, min orderkey among ties — one struct-max aggregate
        F.max(
            F.struct(F.col("dev2").alias("d"), (-F.col("o_orderkey")).alias("nk"))
        ).alias("top"),
    )
    return agg.select(
        "n_orders",
        "median_cents_x2",
        "mad_cents_x4",
        "n_outliers",
        (-F.col("top.nk")).cast("long").alias("top_outlier_key"),
        det_round(
            (2.0 * F.col("top.d")) / (1.4826 * F.col("mad_cents_x4"))
        ).alias("top_robust_z_r6"),
    )


# --------------------------------------------------------------------------
# Repeat-purchase survival curve (bounded month-gap domain)
# --------------------------------------------------------------------------


@register(
    "customer_repeat_survival",
    oracle=f"""
WITH o AS (
  SELECT o_custkey AS custkey, o_orderdate, o_orderkey FROM orders),
g AS (
  SELECT date_diff('day', o_orderdate,
                   lead(o_orderdate) OVER (PARTITION BY custkey
                                           ORDER BY o_orderdate, o_orderkey))
           // 30 AS gap_m
  FROM o),
cnt AS (SELECT gap_m, count(*) AS n_gaps FROM g
        WHERE gap_m IS NOT NULL GROUP BY gap_m),
tot AS (SELECT CAST(sum(n_gaps) AS BIGINT) AS total FROM cnt),
surv AS (
  SELECT c1.gap_m, max(c1.n_gaps) AS n_gaps,
         CAST(sum(c2.n_gaps) AS BIGINT) AS n_ge
  FROM cnt c1 JOIN cnt c2 ON c2.gap_m >= c1.gap_m
  GROUP BY c1.gap_m)
SELECT s.gap_m, s.n_gaps, s.n_ge, t.total,
       {duck_det_round6("CAST(s.n_ge AS DOUBLE) / t.total")} AS surv_r6
FROM surv s CROSS JOIN tot t ORDER BY s.gap_m
""",
)
def q_customer_repeat_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase survival curve: for each 30-day gap bucket g, the
    fraction of consecutive-order gaps that reached AT LEAST g — the
    survival function S(g) a retention team reads off.

    Gaps come from a per-customer lead() window (per-key state, scales
    out); the survival tail n_ge is a TRIANGULAR SELF-JOIN over the
    gap-bucket domain — bounded by the calendar (~date-range/30 rows),
    never by row count — so there is no ordered cumulative window and no
    data-sized join anywhere past the first aggregate.  Counts are
    exact integers; the one double division lands under det_round6."""
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    pc = W.partitionBy("custkey").orderBy("o_orderdate", "o_orderkey")
    g = orders.select(
        F.col("o_custkey").alias("custkey"), "o_orderdate", "o_orderkey"
    ).select(
        (
            F.datediff(F.lead("o_orderdate").over(pc), F.col("o_orderdate"))
            / F.lit(30)
        )
        .cast("long")
        .alias("gap_m")
    )
    cnt = (
        g.filter(F.col("gap_m").isNotNull())
        .groupBy("gap_m")
        .agg(F.count("*").alias("n_gaps"))
        .localCheckpoint()  # both sides of the triangular join + total
    )
    tot = cnt.agg(F.sum("n_gaps").cast("long").alias("total"))
    c1, c2 = cnt.alias("c1"), cnt.alias("c2")
    surv = (
        c1.join(F.broadcast(c2), F.col("c2.gap_m") >= F.col("c1.gap_m"))
        .groupBy(F.col("c1.gap_m").alias("gap_m"))
        .agg(
            F.max("c1.n_gaps").alias("n_gaps"),
            F.sum("c2.n_gaps").cast("long").alias("n_ge"),
        )
    )
    return (
        surv.crossJoin(F.broadcast(tot))
        .select(
            "gap_m",
            "n_gaps",
            "n_ge",
            "total",
            det_round(F.col("n_ge").cast("double") / F.col("total")).alias("surv_r6"),
        )
        .orderBy("gap_m")
    )


# --------------------------------------------------------------------------
# Hash-based negative sampling for recommender / contrastive training
# --------------------------------------------------------------------------

_NEG_H = (
    "CAST(('0x' || substr(md5(concat_ws(chr(1), 'neg', "
    "CAST(custkey AS VARCHAR), CAST(slot AS VARCHAR))), 1, 8)) AS BIGINT)"
)


@register(
    "customer_negative_samples",
    oracle=f"""
WITH seen AS (
  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
items AS (
  SELECT p_partkey AS partkey,
         row_number() OVER (ORDER BY p_partkey) - 1 AS idx
  FROM part),
n1 AS (SELECT count(*) AS n_items FROM items),
probes AS (
  SELECT u.custkey, s.slot,
         {_NEG_H} % n1.n_items AS idx
  FROM (SELECT DISTINCT custkey FROM seen) u
  CROSS JOIN (SELECT unnest(range(8)) AS slot) s
  CROSS JOIN n1),
cand AS (
  SELECT p.custkey, p.slot, i.partkey
  FROM probes p JOIN items i ON p.idx = i.idx)
SELECT c.custkey, c.slot, c.partkey AS neg_partkey
FROM cand c ANTI JOIN seen s
  ON c.custkey = s.custkey AND c.partkey = s.partkey
ORDER BY c.custkey, c.slot
""",
)
def q_customer_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for implicit-feedback training:
    for every customer, 8 hash-drawn candidate parts with their positive
    (purchased) parts anti-joined away — the negatives an ALS-implicit /
    BPR / contrastive trainer consumes.

    The draw is the engine-wide CONTENT-HASH construction (md5 of
    (custkey, slot) mod |items|), not rand(): reproducible on any
    partitioning or cluster size, and oracle-replayable in ANSI SQL.
    Items map through a dense 0..n-1 index (window-free rank over the
    dimension table, broadcast back); probes are |users| x 8 rows —
    linear fan-out, never a cross join against the item space — and the
    anti-join shuffles on (custkey, partkey) like any fact join.
    Collision slots that land on a seen item are dropped, not re-probed
    (documented contract: E[kept] = k * (1 - density); re-probing would
    need data-dependent iteration for a ~2% fill gain at typical
    sparsity)."""
    from ..functions.hashing import md5_long
    from ..operators.relational import global_rank, with_scalars

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey")
    seen = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("custkey"), F.col("l_partkey").alias("partkey"))
        .distinct()
        .localCheckpoint()  # consumed by the user list and the anti-join
    )
    items = global_rank(part, ["p_partkey"], rank_col="rnk").select(
        F.col("p_partkey").alias("partkey"), (F.col("rnk") - 1).alias("idx")
    )
    n1 = items.agg(F.count("*").alias("n_items"))
    users = seen.select("custkey").distinct()
    probes = with_scalars(
        users.select("custkey", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("slot")),
        n1,
    ).select(
        "custkey",
        "slot",
        (md5_long("custkey", "slot", salt="neg") % F.col("n_items")).alias("idx"),
    )
    cand = probes.join(F.broadcast(items), "idx").select("custkey", "slot", "partkey")
    return (
        cand.join(seen, ["custkey", "partkey"], "left_anti")
        .select("custkey", "slot", F.col("partkey").alias("neg_partkey"))
        .orderBy("custkey", "slot")
    )


# --------------------------------------------------------------------------
# Classical time-series decomposition (trend / seasonal / residual)
# --------------------------------------------------------------------------


@register(
    "monthly_revenue_decomposition",
    oracle=f"""
WITH m AS (
  SELECT CAST(year(o_orderdate) * 12 + (month(o_orderdate) - 1) AS BIGINT) AS mi,
         strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         month(o_orderdate) AS moy,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS actual_cents
  FROM orders GROUP BY 1, 2, 3),
tr AS (
  SELECT c.mi, c.month, c.moy, c.actual_cents,
         CAST(sum(w.actual_cents) AS BIGINT) AS trend_13x,
         count(*) AS n_win
  FROM m c JOIN m w ON w.mi BETWEEN c.mi - 6 AND c.mi + 6
  GROUP BY 1, 2, 3, 4),
full_tr AS (
  SELECT mi, month, moy, actual_cents,
         13 * actual_cents - trend_13x AS dev_13x
  FROM tr WHERE n_win = 13),
seas AS (
  SELECT moy, CAST(sum(dev_13x) AS BIGINT) AS sum_dev_13x,
         count(*) AS n_obs
  FROM full_tr GROUP BY moy)
SELECT f.month, f.actual_cents,
       {duck_det_round6("(13.0 * f.actual_cents - f.dev_13x) / 13.0")} AS trend_r6,
       {duck_det_round6("CAST(s.sum_dev_13x AS DOUBLE) / (13.0 * s.n_obs)")}
         AS seasonal_r6,
       {duck_det_round6(
           "f.dev_13x / 13.0 - CAST(s.sum_dev_13x AS DOUBLE) / (13.0 * s.n_obs)"
       )} AS residual_r6
FROM full_tr f JOIN seas s ON f.moy = s.moy
ORDER BY f.month
""",
)
def q_monthly_revenue_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of monthly order revenue:
    trend (13-month centered moving average), seasonal (per-calendar-
    month mean deviation from trend), residual (the rest) — the
    seasonality screen an analyst runs before forecasting.

    All sums stay EXACT integers as long as possible: the moving-average
    window is a BOUNDED self-join over the calendar-sized month table
    (mi BETWEEN c.mi-6 AND c.mi+6 — never an ordered data window, and
    the joined table is ~#months rows, so it broadcasts), the deviation
    is kept as dev_13x = 13*actual - trend_13x (BIGINT, no division),
    and seasonal means sum those integers before ONE double division.
    Every emitted double is the same explicit left-to-right expression
    on both engines under det_round6.  Months with an incomplete window
    (first/last 6) are excluded from the backcast, the standard
    centered-MA contract."""
    orders = _t(spark, sf_dir, "orders")
    m = (
        orders.groupBy(
            (F.year("o_orderdate") * 12 + (F.month("o_orderdate") - 1))
            .cast("long")
            .alias("mi"),
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM").alias(
                "month"
            ),
            F.month("o_orderdate").alias("moy"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("actual_cents")
        )
        .localCheckpoint()  # both sides of the centered-MA join
    )
    c, w = m.alias("c"), m.alias("w")
    tr = (
        c.join(
            F.broadcast(w),
            F.col("w.mi").between(F.col("c.mi") - 6, F.col("c.mi") + 6),
        )
        .groupBy(
            F.col("c.mi").alias("mi"),
            F.col("c.month").alias("month"),
            F.col("c.moy").alias("moy"),
            F.col("c.actual_cents").alias("actual_cents"),
        )
        .agg(
            F.sum("w.actual_cents").cast("long").alias("trend_13x"),
            F.count("*").alias("n_win"),
        )
    )
    full_tr = tr.filter(F.col("n_win") == 13).select(
        "mi",
        "month",
        "moy",
        "actual_cents",
        (13 * F.col("actual_cents") - F.col("trend_13x")).alias("dev_13x"),
    )
    seas = full_tr.groupBy("moy").agg(
        F.sum("dev_13x").cast("long").alias("sum_dev_13x"),
        F.count("*").alias("n_obs"),
    )
    seasonal = F.col("sum_dev_13x").cast("double") / (13.0 * F.col("n_obs"))
    return (
        full_tr.join(F.broadcast(seas), "moy")
        .select(
            "month",
            "actual_cents",
            det_round((13.0 * F.col("actual_cents") - F.col("dev_13x")) / 13.0).alias(
                "trend_r6"
            ),
            det_round(seasonal).alias("seasonal_r6"),
            det_round(F.col("dev_13x") / 13.0 - seasonal).alias("residual_r6"),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# ABC (Pareto) classification of parts by revenue, window-free
# --------------------------------------------------------------------------


@register(
    "part_abc_classification",
    oracle="""
WITH x AS (
  SELECT l_partkey AS partkey,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey),
tot AS (SELECT CAST(sum(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS total FROM x),
r AS (
  SELECT partkey, cents,
         CAST(row_number() OVER w AS BIGINT) AS rnk,
         CAST(sum(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum_cents
  FROM x
  WINDOW w AS (ORDER BY cents DESC, partkey))
SELECT partkey, cents, rnk, cum_cents,
       CASE WHEN cum_cents * 100 <= 80 * tot.total THEN 'A'
            WHEN cum_cents * 100 <= 95 * tot.total THEN 'B'
            ELSE 'C' END AS abc_class
FROM r CROSS JOIN tot ORDER BY rnk
""",
)
def q_part_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: parts ranked by revenue,
    classed A (first 80% of cumulative revenue), B (to 95%), C (tail).

    The cumulative revenue comes from the WINDOW-FREE global prefix sum
    (operators.relational.global_cumsum — range partition + parallel
    intra-partition running sums + triangular offset fold; descending
    order encoded as ascending (-cents, partkey)), while the oracle runs
    the textbook single-partition sum() OVER (ORDER BY ...).  Class
    boundaries are the CROSS-MULTIPLIED integer tests cum*100 <= 80*total
    — no share division, so boundary parts cannot flip on float noise
    (cum*100 fits int64 through warehouse scale; at 100-TB cents totals
    move both sides into DECIMAL(38,0)).  The total re-enters broadcast."""
    from ..operators.relational import global_cumsum, global_rank, with_scalars

    li = _t(spark, sf_dir, "lineitem")
    x = (
        li.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + F.lit(0.5)
                ).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
        .withColumn("neg", -F.col("cents"))
        .localCheckpoint()  # rank + cumsum + total read one aggregate
    )
    tot = x.agg(F.sum(F.col("cents").cast("decimal(38,0)")).cast("long").alias("total"))
    r = global_rank(x, ["neg", "partkey"], rank_col="rnk")
    c = global_cumsum(r, ["neg", "partkey"], "cents", cumsum_col="cum_cents")
    return (
        with_scalars(c, tot)
        .select(
            "partkey",
            "cents",
            F.col("rnk").cast("long").alias("rnk"),
            F.col("cum_cents").cast("long").alias("cum_cents"),
            F.when(F.col("cum_cents") * 100 <= 80 * F.col("total"), F.lit("A"))
            .when(F.col("cum_cents") * 100 <= 95 * F.col("total"), F.lit("B"))
            .otherwise(F.lit("C"))
            .alias("abc_class"),
        )
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# A/B experiment readout: two-proportion z-test on a content-hash split
# --------------------------------------------------------------------------

_AB_H = (
    "(CAST(('0x' || substr(md5(concat_ws(chr(1), 'ab', "
    "CAST(o_orderkey AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0)"
)


@register(
    "ab_test_urgent_orders",
    oracle=f"""
WITH assigned AS (
  SELECT CASE WHEN {_AB_H} < 0.5 THEN 'A' ELSE 'B' END AS arm,
         (o_orderpriority = '1-URGENT') AS conv
  FROM orders),
agg AS (
  SELECT
    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN arm = 'A' AND conv THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
    CAST(sum(CASE WHEN arm = 'B' AND conv THEN 1 ELSE 0 END) AS BIGINT) AS x_b
  FROM assigned)
SELECT n_a, n_b, x_a, x_b,
       (floor((CAST(x_a AS DOUBLE) / n_a) * 1000000 + 0.5) / 1000000) AS p_a_r6,
       (floor((CAST(x_b AS DOUBLE) / n_b) * 1000000 + 0.5) / 1000000) AS p_b_r6,
       (floor(((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
               / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                      * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                      * (1.0 / n_a + 1.0 / n_b))) * 1000000 + 0.5) / 1000000)
         AS z_r6,
       abs((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
           / sqrt((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                  * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
                  * (1.0 / n_a + 1.0 / n_b))) > 1.959963985 AS significant_95
FROM agg
""",
)
def q_ab_test_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: orders split 50/50 by the engine's
    content-hash assignment (md5 of the order key — the same
    partitioning-independent construction every sampler here uses, so
    arm membership is reproducible on any cluster), metric = URGENT-
    priority rate, scored with the pooled two-proportion z-test.

    The readout reduces to FOUR integers (n/x per arm) in one map-side-
    combinable aggregate; every emitted double (rates, z, the 95%
    verdict) is the same explicit expression of those integers on both
    engines — division and sqrt are IEEE-correctly-rounded, so even the
    significance BOOLEAN is engine-exact, not just det_round-stable."""
    from ..functions.hashing import uniform_hash

    orders = _t(spark, sf_dir, "orders")
    assigned = orders.select(
        F.when(uniform_hash("o_orderkey", salt="ab") < 0.5, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("arm"),
        (F.col("o_orderpriority") == "1-URGENT").alias("conv"),
    )
    agg = assigned.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when((F.col("arm") == "A") & F.col("conv"), 1).otherwise(0))
        .cast("long")
        .alias("x_a"),
        F.sum(F.when((F.col("arm") == "B") & F.col("conv"), 1).otherwise(0))
        .cast("long")
        .alias("x_b"),
    )
    pa = F.col("x_a").cast("double") / F.col("n_a")
    pb = F.col("x_b").cast("double") / F.col("n_b")
    pp = (F.col("x_a") + F.col("x_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    z = (pa - pb) / F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    return agg.select(
        "n_a",
        "n_b",
        "x_a",
        "x_b",
        det_round(pa).alias("p_a_r6"),
        det_round(pb).alias("p_b_r6"),
        det_round(z).alias("z_r6"),
        (F.abs(z) > 1.959963985).alias("significant_95"),
    )


# --------------------------------------------------------------------------
# Hierarchical ratio-to-report: customer -> nation -> region revenue shares
# --------------------------------------------------------------------------


@register(
    "revenue_share_hierarchy",
    oracle=f"""
WITH c AS (
  SELECT cu.c_custkey AS custkey, n.n_name AS nation, r.r_name AS region,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o
  JOIN customer cu ON o.o_custkey = cu.c_custkey
  JOIN nation n ON cu.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2, 3),
nat AS (SELECT nation, CAST(sum(cents) AS BIGINT) AS n_cents FROM c GROUP BY 1),
reg AS (SELECT region, CAST(sum(n.n_cents) AS BIGINT) AS r_cents
        FROM (SELECT DISTINCT nation, region FROM c) nr
        JOIN nat n ON nr.nation = n.nation GROUP BY 1),
tot AS (SELECT CAST(sum(r_cents) AS BIGINT) AS t_cents FROM reg)
SELECT c.custkey, c.nation, c.region, c.cents,
       {duck_det_round6("CAST(c.cents AS DOUBLE) / n.n_cents")} AS share_of_nation_r6,
       {duck_det_round6("CAST(n.n_cents AS DOUBLE) / r.r_cents")} AS nation_share_of_region_r6,
       {duck_det_round6("CAST(r.r_cents AS DOUBLE) / t.t_cents")} AS region_share_r6
FROM c
JOIN nat n ON c.nation = n.nation
JOIN reg r ON c.region = r.region
CROSS JOIN tot t
ORDER BY c.custkey
""",
)
def q_revenue_share_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ratio-to-report: every customer's share of their
    nation's revenue, each nation's share of its region, and each
    region's share of the total — the drill-down contribution block a
    BI layer computes with three ratio_to_report windows.

    Here there are NO windows at all: each level is a vocabulary-sized
    re-aggregate of the level below (nation and region tables are
    bounded), broadcast back onto the customer rows — one data-sized
    aggregate total, everything above it bounded.  All level totals are
    exact integer cents (sums telescope exactly across levels), and the
    three shares are single divisions under det_round6."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    c = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint()  # all three level rollups + final join, one pass
    )
    nat = c.groupBy("nation").agg(F.sum("cents").cast("long").alias("n_cents"))
    reg = (
        c.select("nation", "region")
        .distinct()
        .join(nat, "nation")
        .groupBy("region")
        .agg(F.sum("n_cents").cast("long").alias("r_cents"))
    )
    tot = reg.agg(F.sum("r_cents").cast("long").alias("t_cents"))
    return (
        c.join(F.broadcast(nat), "nation")
        .join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "custkey",
            "nation",
            "region",
            "cents",
            det_round(F.col("cents").cast("double") / F.col("n_cents")).alias(
                "share_of_nation_r6"
            ),
            det_round(F.col("n_cents").cast("double") / F.col("r_cents")).alias(
                "nation_share_of_region_r6"
            ),
            det_round(F.col("r_cents").cast("double") / F.col("t_cents")).alias(
                "region_share_r6"
            ),
        )
        .orderBy("custkey")
    )


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test (exact integer ECDF distance)
# --------------------------------------------------------------------------


@register(
    "order_price_drift_ks",
    oracle=f"""
WITH c AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         (o_orderdate < TIMESTAMP '2000-01-01') AS is_ref
  FROM orders),
g AS (
  SELECT cents,
         CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cr,
         CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cc
  FROM c GROUP BY cents),
t AS (SELECT CAST(sum(cr) AS BIGINT) AS n1, CAST(sum(cc) AS BIGINT) AS n2 FROM g),
w AS (
  SELECT CAST(sum(cr) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1,
         CAST(sum(cc) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c2
  FROM g),
d AS (SELECT CAST(max(abs(c1 * t.n2 - c2 * t.n1)) AS BIGINT) AS d_num
      FROM w CROSS JOIN t)
SELECT t.n1 AS n_ref, t.n2 AS n_cur, d.d_num,
       {duck_det_round6("CAST(d.d_num AS DOUBLE) / (t.n1 * t.n2)")} AS d_r6,
       (CAST(d.d_num AS DOUBLE) / (t.n1 * t.n2))
         > 1.358 * sqrt((t.n1 + t.n2) / (CAST(t.n1 AS DOUBLE) * t.n2))
         AS reject_95
FROM d CROSS JOIN t
""",
)
def q_order_price_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between historical (pre-2000)
    and recent order prices — the nonparametric drift companion of the
    PSI and chi-square screens: D = sup |ECDF_ref - ECDF_cur|.

    The supremum is computed EXACTLY: per distinct price the two sample
    counts aggregate once, cumulative counts come from the window-free
    global prefix sum over the (distinct-cents-sized) table, and the
    ECDF gap is the cross-multiplied integer |c1*n2 - c2*n1| — no float
    ECDF anywhere, so D's argmax cannot flip on rounding (c1*n2 fits
    int64 through ~3e9 rows/side; past that move the product into
    DECIMAL).  The single division and the 95% Smirnov threshold
    (1.358*sqrt((n1+n2)/(n1*n2))) are identical explicit expressions on
    both engines, so even the reject boolean is engine-exact."""
    from ..operators.relational import global_cumsum, with_scalars

    orders = _t(spark, sf_dir, "orders")
    c = orders.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")).alias("is_ref"),
    )
    g = (
        c.groupBy("cents")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).cast("long").alias("cr"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).cast("long").alias("cc"),
        )
        .localCheckpoint()  # totals + two prefix sums read one aggregate
    )
    t = g.agg(
        F.sum("cr").cast("long").alias("n1"), F.sum("cc").cast("long").alias("n2")
    )
    w = global_cumsum(
        global_cumsum(g, ["cents"], "cr", cumsum_col="c1"), ["cents"], "cc", cumsum_col="c2"
    )
    d = with_scalars(w, t).agg(
        F.max(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")))
        .cast("long")
        .alias("d_num"),
        F.max("n1").alias("n_ref"),
        F.max("n2").alias("n_cur"),
    )
    d_stat = F.col("d_num").cast("double") / (F.col("n_ref") * F.col("n_cur"))
    thresh = 1.358 * F.sqrt(
        (F.col("n_ref") + F.col("n_cur"))
        / (F.col("n_ref").cast("double") * F.col("n_cur"))
    )
    return d.select(
        "n_ref",
        "n_cur",
        "d_num",
        det_round(d_stat).alias("d_r6"),
        (d_stat > thresh).alias("reject_95"),
    )
