"""Relational-core queries (SURVEY §2.2-2.7): joins, aggregates, set ops,
windows, explode — each oracle-checked against DuckDB.

Scale notes per query are inline; the common themes: dims broadcast,
aggregations are partial+final hash aggs, top-k never leaves the
executors, and no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.relational import anti_join, case_when_in, semi_join
from ..operators.topk import top_k_per_group
from . import _t, register


# -- J1: multi-way star join + grouped agg (broadcast dims) ----------------


@register(
    "revenue_per_nation",
    oracle="""
SELECT n.n_name,
       count(*) AS n_items,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
""",
)
def q_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer/nation are dimensions: broadcast them so the only wide
    shuffle is lineitem⋈orders on orderkey (at 100 TB: co-partition or
    bucket lineitem+orders on orderkey to kill that one too)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("n_name")
    )


# -- J3: anti join (reference new_split_script.py:8-9 pandas merge) --------


@register(
    "orders_without_lineitems",
    oracle="""
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
ORDER BY o_orderkey
""",
)
def q_orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    return anti_join(orders, li, ["o_orderkey"]).orderBy("o_orderkey")


# -- X2: semi join (disjointness-check primitive, extension.py:150-152) ----


@register(
    "customers_with_urgent_orders",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
)
def q_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return semi_join(cust, urgent, ["c_custkey"]).orderBy("c_custkey")


# -- X1: EXCEPT ALL multiset difference (reference split_script.py:46) -----


@register(
    "lineitem_except_returns",
    oracle="""
SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem
EXCEPT ALL
SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem WHERE l_returnflag = 'R'
""",
)
def q_lineitem_except_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    base = li.select("l_orderkey", "l_partkey", "l_linenumber")
    returns = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    return base.exceptAll(returns)


# -- P5: CASE WHEN + IN-list labeling (reference split_script.py:40) -------


@register(
    "order_priority_classes",
    oracle="""
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
            WHEN o_orderpriority IN ('3-MEDIUM') THEN 'medium'
            ELSE 'low' END AS priority_class,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,2))), 2) AS DOUBLE) AS total_value
FROM orders GROUP BY 1 ORDER BY 1
""",
)
def q_order_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    label = case_when_in(
        "o_orderpriority",
        {"high": ["1-URGENT", "2-HIGH"], "medium": ["3-MEDIUM"]},
        default="low",
    )
    return (
        orders.withColumn("priority_class", label)
        .groupBy("priority_class")
        .agg(
            F.count("*").alias("n_orders"),
            # money sums go through DECIMAL so they are exact and
            # summation-order-independent (engine convention)
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("priority_class")
    )


# -- O3/§2.5: top-k per group via window rank ------------------------------


@register(
    "top3_suppliers_per_nation",
    oracle="""
SELECT s_nationkey, s_suppkey, round(s_acctbal, 2) AS s_acctbal, rank
FROM (
  SELECT s_nationkey, s_suppkey, s_acctbal,
         row_number() OVER (PARTITION BY s_nationkey
                            ORDER BY s_acctbal DESC, s_suppkey) AS rank
  FROM supplier)
WHERE rank <= 3
ORDER BY s_nationkey, rank
""",
)
def q_top3_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")
    out = top_k_per_group(
        sup,
        ["s_nationkey"],
        [F.col("s_acctbal").desc(), F.col("s_suppkey").asc()],
        k=3,
        keep_rank=True,
    )
    return out.select(
        "s_nationkey", "s_suppkey", F.round("s_acctbal", 2).alias("s_acctbal"), "rank"
    ).orderBy("s_nationkey", "rank")


# -- A6/A7: distinct + count-distinct --------------------------------------


@register(
    "active_customers_per_nation",
    oracle="""
SELECT c_nationkey, count(DISTINCT c.c_custkey) AS n_active
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c_nationkey ORDER BY c_nationkey
""",
)
def q_active_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_nationkey")
        .agg(F.countDistinct("c_custkey").alias("n_active"))
        .orderBy("c_nationkey")
    )


# -- A4: two-level agg + collect_list (reference als.py:115-118) -----------


@register(
    "order_part_lists",
    oracle="""
SELECT l_orderkey,
       array_to_string(list_sort(list(l_partkey)), ',') AS parts,
       count(*) AS n_parts
FROM (SELECT l_orderkey, l_partkey, avg(l_quantity) AS q
      FROM lineitem GROUP BY l_orderkey, l_partkey)
GROUP BY l_orderkey
ORDER BY l_orderkey
""",
)
def q_order_part_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-mean then per-group sorted list — the exact shape the
    reference uses to build per-user ground-truth label lists.  The
    sorted list is emitted as a ','-joined string: the driver's pandas
    canonicalizer cannot hash raw list cells, and the string form is
    the order-canonical fingerprint anyway."""
    li = _t(spark, sf_dir, "lineitem")
    dedup = li.groupBy("l_orderkey", "l_partkey").agg(F.avg("l_quantity").alias("q"))
    return (
        dedup.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("l_partkey")).cast("array<string>"), ","
            ).alias("parts"),
            F.count("*").alias("n_parts"),
        )
        .orderBy("l_orderkey")
    )


# -- A2/A3: grand aggregate + exact percentile -----------------------------


@register(
    "lineitem_global_stats",
    oracle="""
SELECT count(*) AS n_rows,
       count(DISTINCT l_partkey) AS n_parts,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,2))), 2) AS DOUBLE) AS sum_price,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
       strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship,
       strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ship
FROM lineitem
""",
)
def q_lineitem_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,2)")), 2)
        .cast("double")
        .alias("sum_price"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("min_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("max_ship"),
    )


# -- P8: explode / flatten (reference als.py:110-112) ----------------------


@register(
    "part_type_word_counts",
    oracle="""
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
GROUP BY word ORDER BY word
""",
)
def q_part_type_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_type", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy("word")
    )


# -- P7: struct-field extraction over array (reference als.py:120) ---------


@register(
    "order_items_in_line_order",
    oracle="""
SELECT l_orderkey,
       array_to_string(
         list_transform(
           list_sort(list({'a': l_linenumber, 'b': l_partkey})),
           x -> x.b), ',') AS items
FROM lineitem
GROUP BY l_orderkey
ORDER BY l_orderkey
""",
)
def q_order_items_in_line_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect array<struct>, sort by line number, extract one field —
    the recommendForAllUsers output-shaping pattern.  Emitted as a
    ','-joined string so the driver's pandas canonicalizer can hash it
    (order inside the string IS the semantic payload here)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("l_linenumber").alias("a"), F.col("l_partkey").alias("b"))
                    )
                )
                .getField("b")
                .cast("array<string>"),
                ",",
            ).alias("items")
        )
        .orderBy("l_orderkey")
    )


# -- A8: unique-value dense encoding (reference extension.py:34-47) --------


@register(
    "brand_dense_ids",
    oracle="""
SELECT p_brand, row_number() OVER (ORDER BY p_brand) - 1 AS dense_id
FROM (SELECT DISTINCT p_brand FROM part)
ORDER BY p_brand
""",
)
def q_brand_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 0-based ids for a categorical column — the reference
    built these with pandas dicts on the driver; here it is a distinct +
    window (one small shuffle, stays distributed)."""
    from pyspark.sql import Window

    part = _t(spark, sf_dir, "part")
    w = Window.orderBy("p_brand")
    return (
        part.select("p_brand")
        .distinct()
        .withColumn("dense_id", F.row_number().over(w) - 1)
        .orderBy("p_brand")
    )


# -- A3/A7 approximate variants (sketches differ per engine -> rows-only) --


@register(
    "lineitem_approx_stats",
    oracle="""
SELECT count(DISTINCT l_partkey) AS exact_parts,
       true AS parts_err_ok,
       true AS median_qty_ok,
       true AS price_q25_ok,
       true AS price_q50_ok,
       true AS price_q75_ok
FROM lineitem
""",
)
def q_lineitem_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approx count-distinct + Greenwald-Khanna approx percentile —
    the 100 TB path where exact versions need a full sort/shuffle.

    The sketch VALUES are engine-specific and can never hash-match a SQL
    oracle; what IS checkable is that each sketch lands inside its
    published error bound.  The gated row therefore carries the exact
    distinct count plus one boolean per sketch:

    - ``parts_err_ok``: HLL++ at default rsd=0.05 within 3σ (15%) of the
      exact distinct count;
    - ``*_ok`` percentiles: the GK estimate (accuracy=10000, rank error
      ≤ n/10000) lies between the EXACT p±0.01 quantiles, a 100× looser
      rank window computed in the same single aggregate pass.

    The oracle recomputes the exact count and asserts the booleans as
    literal ``true`` — if a sketch ever drifts out of bound, the value
    hash goes red.  (Exact counterparts of the stats themselves are
    oracle-checked in ``lineitem_global_stats``.)"""
    li = _t(spark, sf_dir, "lineitem")
    quart = F.expr("percentile_approx(l_extendedprice, array(0.25, 0.5, 0.75))")
    qtile = F.expr(
        "percentile(l_extendedprice, array(0.24, 0.26, 0.49, 0.51, 0.74, 0.76))"
    )
    agg = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey").alias("__approx_parts"),
        F.expr("percentile_approx(l_quantity, 0.5)").alias("__approx_median_qty"),
        F.expr("percentile(l_quantity, array(0.49, 0.51))").alias("__qty_bounds"),
        quart.alias("__q"),
        qtile.alias("__b"),
    )

    def within(est, lo, hi):
        return (est >= lo) & (est <= hi)

    return agg.select(
        "exact_parts",
        (
            F.abs(F.col("__approx_parts") - F.col("exact_parts"))
            <= F.col("exact_parts") * F.lit(0.15)
        ).alias("parts_err_ok"),
        within(
            F.col("__approx_median_qty"),
            F.col("__qty_bounds").getItem(0),
            F.col("__qty_bounds").getItem(1),
        ).alias("median_qty_ok"),
        within(
            F.col("__q").getItem(0), F.col("__b").getItem(0), F.col("__b").getItem(1)
        ).alias("price_q25_ok"),
        within(
            F.col("__q").getItem(1), F.col("__b").getItem(2), F.col("__b").getItem(3)
        ).alias("price_q50_ok"),
        within(
            F.col("__q").getItem(2), F.col("__b").getItem(4), F.col("__b").getItem(5)
        ).alias("price_q75_ok"),
    )


@register(
    "hll_mergeable_distinct",
    oracle="""
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_global,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_groups,
       true AS merged_ok,
       true AS groups_ok
FROM orders
""",
)
def q_hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB distinct-count architecture: build one Datasketches
    HLL sketch PER GROUP (map-side partial, ~KB each), then MERGE the
    binary sketches with ``hll_union_agg`` — re-aggregation without
    rescanning, the property a plain approx_count_distinct result does
    not have.  Gated via error-bound invariants (same design as
    ``lineitem_approx_stats``): every per-group estimate and the merged
    global estimate must land within 5% of exact (lgConfigK=12 →
    rsd ≈ 1.6%, so 5% ≈ 3σ); the oracle recomputes the exact counts and
    pins the booleans true."""
    o = _t(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.countDistinct("o_custkey").alias("exact_g"),
    )
    folded = per_group.agg(
        F.count("*").alias("n_groups"),
        F.expr(
            "bool_and(abs(hll_sketch_estimate(sk) - exact_g) <= exact_g * 0.05)"
        ).alias("groups_ok"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__merged_est"),
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("exact_global"))
    return exact.crossJoin(F.broadcast(folded)).select(
        "exact_global",
        "n_groups",
        (
            F.abs(F.col("__merged_est") - F.col("exact_global"))
            <= F.col("exact_global") * F.lit(0.05)
        ).alias("merged_ok"),
        "groups_ok",
    )


@register(
    "bloom_semi_join_revenue",
    oracle="""
SELECT l_returnflag,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey
                AND o.o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_bloom_semi_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with a bloom pre-filter on the probe side (the explicit
    form of Spark's AQE runtime row-level filtering): lineitems of
    urgent orders.  exact=True makes the bloom purely a shuffle
    reducer, so the oracle is the plain EXISTS semi join."""
    from ..operators.bloom import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "nation_activity_full_outer",
    oracle="""
WITH s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers
           FROM supplier WHERE s_acctbal > 5000 GROUP BY 1),
c AS (SELECT c_nationkey AS nk, count(*) AS n_customers
      FROM customer WHERE c_mktsegment = 'AUTOMOBILE' GROUP BY 1)
SELECT coalesce(s.nk, c.nk) AS nationkey,
       coalesce(n_suppliers, 0) AS n_suppliers,
       coalesce(n_customers, 0) AS n_customers
FROM s FULL OUTER JOIN c ON s.nk = c.nk
ORDER BY nationkey
""",
)
def q_nation_activity_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two filtered per-nation aggregates — either
    side may be missing a nation, and both null-extensions must
    surface.  Completes the join-type matrix (inner / left / semi /
    anti / full / cross are all oracle-checked now)."""
    sup = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    return (
        sup.join(cust, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        )
        .orderBy("nationkey")
    )


@register(
    "region_priority_grid",
    oracle="""
SELECT r_name, p.o_orderpriority, count(*) AS n_cells
FROM region
CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_region_priority_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS join: the (region x priority) dense dimension grid
    — the pattern behind dense report scaffolds and the with_scalars
    helper, here surfaced as a first-class operator."""
    region = _t(spark, sf_dir, "region")
    prio = _t(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return (
        region.select("r_name")
        .crossJoin(prio)
        .groupBy("r_name", "o_orderpriority")
        .agg(F.count("*").alias("n_cells"))
        .orderBy("r_name", "o_orderpriority")
    )


@register(
    "sliding_7d_active_users",
    oracle="""
WITH ud AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
  FROM events),
days AS (SELECT DISTINCT d FROM ud),
win AS (
  SELECT r.d AS report_day, ud.user_id
  FROM ud JOIN days r ON ud.d BETWEEN r.d - INTERVAL 6 DAY AND r.d)
SELECT strftime(report_day, '%Y-%m-%d') AS report_day,
       count(DISTINCT user_id) AS n_users_7d,
       true AS hll_ok
FROM win GROUP BY report_day ORDER BY report_day
""",
)
def q_sliding_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding distinct users (weekly-active-users) two ways in
    one gated row set: the exact count, and the mergeable-sketch
    architecture that replaces it at 100 TB — ONE HLL sketch per day
    (kilobytes of state, the only thing a production pipeline persists;
    cf. operators/incremental.py), with each report day answered by
    unioning its 7 day-sketches instead of rescanning a week of raw
    events.  Sliding distinct is not decomposable exactly, which is
    precisely why the sketch path exists; the gate pins the estimate
    within 5% (~3 sigma at lgConfigK=12) of exact for EVERY window."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    ud = ud.localCheckpoint(eager=False)  # consumed by exact + day lists
    days = ud.select("d").distinct().withColumnRenamed("d", "report_day")
    cond = (F.col("d") >= F.date_sub(F.col("report_day"), 6)) & (
        F.col("d") <= F.col("report_day")
    )
    exact = (
        ud.join(F.broadcast(days), cond)
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("n_users_7d"))
    )
    day_sk = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = (
        day_sk.join(F.broadcast(days), cond)
        .groupBy("report_day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__est"))
    )
    return (
        exact.join(est, "report_day")
        .select(
            F.date_format("report_day", "yyyy-MM-dd").alias("report_day"),
            "n_users_7d",
            (
                F.abs(F.col("__est") - F.col("n_users_7d"))
                <= F.col("n_users_7d") * F.lit(0.05)
            ).alias("hll_ok"),
        )
        .orderBy("report_day")
    )
