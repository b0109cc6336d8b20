"""Remaining TPC-H decision-support shapes over the driver star schema
(SURVEY §2 breadth; Q1/Q3/Q4/Q5/Q10/Q14/Q16/Q17/Q18/Q22 live in
breadth.py / relational.py).  The testdata has no partsupp table and no
l_shipmode/commitdate columns, so Q2/Q9/Q11/Q12/Q20/Q21 are
shape-preserving adaptations (documented per query) — the plan skeleton
(join graph, subquery kind, aggregate form) is the TPC-H one even where
a predicate or source relation had to move to an existing column
(partsupp is derived from lineitem as the distinct part↔supplier
bridge with min unit price standing in for ps_supplycost).

Money sums follow the registry convention: per-row cast to DECIMAL,
exact (order-free) sum, round to cents, cast back to double — identical
in DuckDB, so the value hash is partition-count-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.rounding import det_round
from . import _t, register


def _dec_rev(li_prefixed: bool = True):
    """l_extendedprice*(1-l_discount) as exact DECIMAL(38,4) per row."""
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,4)"
    )


_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))"


@register(
    "tpch_q7_nation_volume",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS volume
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN nation n2   ON c.c_nationkey = n2.n_nationkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation n1   ON s.s_nationkey = n1.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.  The
    fact table joins TWO dimension chains (customer-side nation and
    supplier-side nation) — both chains broadcast, so the only wide
    shuffle is lineitem⋈orders on orderkey; the nation-pair predicate
    prunes rows right after the (cheap) broadcast probes."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(_dec_rev()), 2).cast("double").alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
WITH all_rev AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         {_REV_SQL} AS rev,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  JOIN region r   ON n2.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  WHERE r.r_name = 'ASIA')
SELECT o_year,
       (floor((CAST(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
                                   ELSE CAST(0 AS DECIMAL(38,4)) END), 2) AS DOUBLE)
               / CAST(round(sum(rev), 2) AS DOUBLE)) * 1000000 + 0.5) / 1000000) AS mkt_share
FROM all_rev
GROUP BY o_year
ORDER BY o_year
""",
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of revenue delivered into a
    region, per order-year.  Numerator and denominator come out of the
    SAME single aggregation pass (conditional sum), both exact-decimal
    so the double division is bit-identical across engines."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = _dec_rev()
    zero = F.lit(0).cast("decimal(38,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(zero)), 2
            )
            .cast("double")
            .alias("num"),
            F.round(F.sum(rev), 2).cast("double").alias("den"),
        )
        .select(
            "o_year", det_round(F.col("num") / F.col("den")).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           - 0.6 * p.p_retailprice * l.l_quantity
                           AS DECIMAL(38,4))), 2) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY nation, o_year DESC
""",
)
def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line by supplier nation and
    year.  Adaptation: the testdata has no partsupp, so supply cost is
    modeled as 0.6 * p_retailprice (the plan shape — fact joined to
    part+supplier+nation+orders with a LIKE filter on part — is Q9's).
    The LIKE prunes the broadcast part side before the join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(38,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q12_priority_shipping",
    oracle="""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > o.o_orderdate
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
""",
)
def q_tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: did late-shipped lines carry critical-priority
    orders?  Adaptation: no l_shipmode/commitdate in the testdata, so
    the mode grouping becomes l_linestatus and 'late' is shipdate after
    orderdate — the conditional-count pivot over a fact⋈fact join with
    a post-join residual predicate is Q12's plan."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '3-MEDIUM'
  GROUP BY c.c_custkey)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count, with the
    join-level (not WHERE-level) filter that keeps zero-order customers
    in the left join.  Two-level aggregation: first per customer (wide,
    on custkey), then the tiny histogram over counts."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "3-MEDIUM"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""",
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — a
    derived view consumed twice (once for the max, once for the rows).
    localCheckpoint materializes the small per-supplier rollup ONCE so
    the two consumers don't recompute the lineitem scan; the scalar max
    re-enters via a broadcast 1-row join, not a collect.  Exact-decimal
    revenue makes the equality comparison engine-stable."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_dec_rev()), 2).cast("double").alias("total_revenue"))
        .localCheckpoint(eager=False)
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle=f"""
SELECT CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
)
def q_tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under three DISJUNCTIVE brand/size/quantity
    branches — the classic test that an optimizer can (a) keep the OR
    out of the join condition, joining once on partkey, and (b) still
    push the derivable common filters to each side.  Spark plans this
    as one broadcast hash join with the OR as a post-join filter."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(branch)
        .agg(F.round(F.sum(_dec_rev()), 2).cast("double").alias("revenue"))
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
""",
)
def q_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY supplier at fault in
    a multi-supplier order — correlated EXISTS + NOT EXISTS against the
    same fact table.  Adaptation: 'at fault' is l_returnflag='R' (the
    testdata has no receipt/commit dates).  Both subqueries become
    self-joins on orderkey with a suppkey inequality: a left-semi for
    the EXISTS, a left-anti for the NOT EXISTS — each ships only
    (orderkey, suppkey[, flag]), never the whole row."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    other = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("s")
    )
    other_r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("s")
    )
    cand = l1.join(
        other,
        (l1.l_orderkey == other.k) & (l1.l_suppkey != other.s),
        "left_semi",
    )
    sole = cand.join(
        other_r,
        (cand.l_orderkey == other_r.k) & (cand.l_suppkey != other_r.s),
        "left_anti",
    )
    return (
        sole.join(orders, sole.l_orderkey == orders.o_orderkey, "left_semi")
        .join(F.broadcast(supp), sole.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,4))), 2) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast revenue change — a pure scan-side query.  All
    three predicates (shipdate range, discount band, quantity cap) push
    down into the parquet scan (PushedFilters), the projection prunes to
    two columns, and the single grand aggregate is partial+final with no
    groupBy shuffle at all: at 100 TB this is the I/O-bound best case
    and any plan with a wide exchange here is wrong."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(38,4)")
    return li.agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))


def _pseudo_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp stand-in: the distinct (part, supplier) pairs observed in
    lineitem, with min(l_extendedprice / l_quantity) as ps_supplycost.
    min (not avg) keeps the double bit-identical across engines and
    partitionings — no summation-order sensitivity."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))


_PS_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(l_extendedprice / l_quantity) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
"""


@register(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
WITH ps AS ({_PS_SQL})
SELECT s.s_acctbal, s.s_name, n.n_name AS nation, p.p_partkey, p.p_type,
       floor(ps.ps_supplycost * 1000000 + 0.5) / 1000000 AS supplycost
FROM part p
JOIN ps ON ps.ps_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
  AND ps.ps_supplycost = (
    SELECT min(ps2.ps_supplycost) FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
    WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s.s_acctbal DESC, nation, s.s_name, p.p_partkey
""",
)
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the cheapest supplier per part within a region —
    a correlated scalar-min subquery whose decorrelated Spark plan is a
    min-window over the region-scoped (part, supplier, cost) set, then
    an equality filter against the window min (ties keep every minimal
    supplier, exactly like the SQL).  The oracle runs the literal
    correlated form to prove the decorrelation equivalent.  All four
    dimension joins broadcast; the only wide exchange is the pseudo-
    partsupp groupBy on (partkey, suppkey), and the window repartitions
    by partkey — both keys are high-cardinality and unskewed.

    The output cost is rounded as floor(x*1e6 + 0.5)/1e6 — double ops
    only, bit-identical cross-engine — NOT engine round(x, 6):
    price/quantity quotients are often binary-exact with decimal
    expansions ending in 5 at the 7th place (quantity = 2^k), exactly
    where Java's BigDecimal HALF_UP and DuckDB's scaled-multiply
    rounding disagree (caught at sf0.1)."""
    from pyspark.sql import Window

    ps = _pseudo_partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    regional = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        regional.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_type",
            (F.floor(F.col("ps_supplycost") * 1000000 + 0.5) / 1000000).alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
WITH val AS (
  SELECT l.l_partkey,
         sum(CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(38,4))) AS v
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  GROUP BY 1)
SELECT l_partkey, CAST(round(v, 2) AS DOUBLE) AS part_value
FROM val
WHERE v * (SELECT count(*) FROM val) > 3 * (SELECT sum(v) FROM val)
ORDER BY part_value DESC, l_partkey
""",
)
def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose inventory value (here: shipped
    value, price*qty, for suppliers of three nations) exceeds a fraction
    of the nation-group total — a grouped aggregate filtered against a
    global-scalar subquery over the SAME aggregate.  The per-part frame
    is localCheckpointed so the grand total reuses it instead of
    re-shuffling lineitem; the scalar re-enters via a 1-row broadcast
    crossJoin (no driver collect).  The threshold is SCALE-FREE — keep
    parts above 3x the average part value (v * n_parts > 3 * total) —
    because a fixed share like TPC-H's 0.0001/SF empties out as the
    part count grows (caught at sf0.1); the comparison stays in exact
    DECIMAL/BIGINT on both engines — no float threshold wobble."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(38,4)")).alias(
                "v"
            )
        )
        .localCheckpoint(eager=False)
    )
    total = val.agg(F.sum("v").alias("total"), F.count("*").alias("n_parts"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v") * F.col("n_parts") > F.col("total") * 3)
        .select("l_partkey", F.round("v", 2).cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "tpch_q20_excess_shippers",
    oracle="""
WITH sel AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small %'),
agg AS (
  SELECT l_suppkey,
         sum(CASE WHEN year(l_shipdate) = 1997
                  THEN CAST(l_quantity AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS q97,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qtot
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM sel)
  GROUP BY 1)
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM agg WHERE q97 * 6 > qtot)
ORDER BY s.s_name
""",
)
def q_tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who concentrated their shipments of a
    name-selected part family into one year — a nested IN-subquery
    chain (part-name filter → per-supplier aggregate threshold →
    supplier semi-join), Q20's skeleton with 'availqty > 0.5 * shipped'
    transposed onto shipped-quantity year-shares (no partsupp table;
    the threshold 1/6 sits above the uniform 1/7 year share, so it
    selects genuinely concentrated suppliers, not everyone).  Both IN
    subqueries become left-semi joins: the part filter semi-joins the
    scan (broadcast, pre-aggregation), and the qualifying-supplier set
    semi-joins the 100-row supplier dim.  The q97*6 > qtot test is
    exact DECIMAL arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    sel = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small %")).select("p_partkey")
    qdec = F.col("l_quantity").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    agg = (
        li.join(F.broadcast(sel), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(F.year("l_shipdate") == 1997, qdec).otherwise(zero)).alias("q97"),
            F.sum(qdec).alias("qtot"),
        )
    )
    qualifying = agg.filter(F.col("q97") * 6 > F.col("qtot")).select("l_suppkey")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(qualifying), supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )
