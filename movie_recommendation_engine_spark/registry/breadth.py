"""Engine-breadth queries beyond the reference's own surface: set
intersection, ROLLUP grouping sets, PIVOT, and a CSV sink/scan
round-trip — each oracle-checked.

(The reference uses none of these — SURVEY §2.4/§2.7 note their absence
— but a complete engine offers them, and they exercise Catalyst paths
the other queries don't: ExpandExec for rollup, PivotFirst, and the CSV
datasource writer/reader.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.readers import read_csv, read_json, read_orc
from ..sources.writers import write_csv, write_json, write_orc
from ..functions.rounding import det_round
from . import _t, duck_hash_sql, register, staging_dir

# Basket-width cap for the pair-fanout self-joins over (l_orderkey,
# l_partkey): k^2/2 pairs per k-row basket is a small constant on
# uniform data (max basket 17 rows at the probed SFs — the cap is a
# provable no-op and every existing oracle hash is unchanged) but
# detonates under key skew (round-8 probe: a 20%-hot order = 15,963
# distinct parts -> 1.3e8 pairs from ONE group, >160x the uniform
# wall).  Both engine and oracle apply the identical deterministic
# row_number rule, so capped results stay hash-checkable on ANY data.
_BASKET_CAP = 256

# distinct (order, part) baskets, capped — for pair ops defined over
# distinct co-occurrence (item-item CF, pagerank edges)
_CAPPED_BASKETS_SQL = f"""
  SELECT l_orderkey, l_partkey FROM (
    SELECT l_orderkey, l_partkey,
           row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey)
             AS __bw
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
  WHERE __bw <= {_BASKET_CAP}"""

# raw lineitem ROWS capped (duplicate parts kept; l_linenumber makes the
# order total) — for pair ops defined over row pairs (co-occurrence
# counts, triangle edge weights)
_CAPPED_ROWS_SQL = f"""
  SELECT l_orderkey, l_partkey FROM (
    SELECT l_orderkey, l_partkey,
           row_number() OVER (PARTITION BY l_orderkey
                              ORDER BY l_partkey, l_linenumber) AS __bw
    FROM lineitem)
  WHERE __bw <= {_BASKET_CAP}"""


def _capped_baskets(li: DataFrame) -> DataFrame:
    """Distinct (l_orderkey, l_partkey) capped at _BASKET_CAP per order."""
    from ..operators.skew import cap_basket

    return cap_basket(
        li.select("l_orderkey", "l_partkey").distinct(),
        "l_orderkey",
        [F.col("l_partkey").asc()],
        w=_BASKET_CAP,
    )


def _capped_rows(li: DataFrame) -> DataFrame:
    """Raw (l_orderkey, l_partkey) rows capped at _BASKET_CAP per order
    (l_linenumber breaks ties to a total order, then drops)."""
    from ..operators.skew import cap_basket

    return cap_basket(
        li.select("l_orderkey", "l_partkey", "l_linenumber"),
        "l_orderkey",
        [F.col("l_partkey").asc(), F.col("l_linenumber").asc()],
        w=_BASKET_CAP,
    ).select("l_orderkey", "l_partkey")


@register(
    "parts_returned_and_accepted",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
INTERSECT
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
ORDER BY l_partkey
""",
)
def q_parts_returned_and_accepted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.intersect(a).orderBy("l_partkey")


@register(
    "parts_returned_and_accepted_all",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
INTERSECT ALL
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
ORDER BY l_partkey
""",
)
def q_parts_returned_and_accepted_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL (min-multiplicity semantics) — the bag
    variant of parts_returned_and_accepted."""
    li = _t(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.intersectAll(a).orderBy("l_partkey")


_SQL_REVENUE = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))), 2)
            AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("sql_interface_revenue", oracle=_SQL_REVENUE)
def q_sql_interface_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry path: tables registered as temp views, the query
    submitted as ANSI SQL via spark.sql — THE SAME SQL TEXT is the
    oracle, so this also proves dialect-compatible SQL support.
    Catalyst plans it identically to the DataFrame spelling (broadcast
    dims, partial aggs)."""
    for t in ("lineitem", "orders", "customer", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_REVENUE)


@register(
    "customer_order_counts_outer",
    oracle="""
SELECT c_custkey,
       count(o_orderkey) AS n_orders,
       CAST(round(sum(CAST(coalesce(o_totalprice, 0) AS DECIMAL(38,2))), 2) AS DOUBLE)
         AS total_spent
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
ORDER BY c_custkey
""",
)
def q_customer_order_counts_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join keeping zero-order customers (count(col) skips
    the null-extended rows, so they surface as n_orders = 0) — the
    outer-join shape no other query covers."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)).cast("decimal(38,2)")), 2
            )
            .cast("double")
            .alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@register(
    "orders_never_returned",
    oracle="""
SELECT l_orderkey FROM lineitem
EXCEPT
SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
ORDER BY l_orderkey
""",
)
def q_orders_never_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set EXCEPT (distinct) via DataFrame.subtract — completes the set
    algebra alongside exceptAll / intersect / intersectAll."""
    li = _t(spark, sf_dir, "lineitem")
    all_orders = li.select("l_orderkey")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return all_orders.subtract(returned).orderBy("l_orderkey")


_Q17_SQL = """
SELECT l_orderkey, l_partkey, l_linenumber, l_extendedprice
FROM lineitem l1
WHERE l_extendedprice > 1.5 * (SELECT avg(l_extendedprice)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l1.l_partkey)
ORDER BY l_orderkey, l_partkey, l_linenumber
"""


@register("lineitems_above_part_avg", oracle=_Q17_SQL)
def q_lineitems_above_part_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): lineitems priced
    50% above their part's average.  Catalyst DECORRELATES this into a
    per-part aggregate + join — no per-row subquery execution; the plan
    is two scans, one agg, one equi-join regardless of row count."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q17_SQL)


@register(
    "rollup_flag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def q_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals in one pass (ExpandExec) — at scale this
    beats running three separate aggregations over the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "pivot_priority_by_status",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (explicit values keep the output
    schema static — required for distributed planning; never let pivot
    scan for distinct values on a 100 TB table)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("o_orderpriority")
    )


@register(
    "csv_roundtrip_agg",
    oracle="""
SELECT s_nationkey, count(*) AS n, CAST(round(sum(CAST(s_acctbal AS DECIMAL(38,2))), 2) AS DOUBLE) AS bal
FROM supplier
GROUP BY s_nationkey ORDER BY s_nationkey
""",
)
def q_csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + schema'd CSV scan (SURVEY §2.1 S1/S4) proven inside the
    oracle gate: supplier -> headered CSV -> read back with an explicit
    schema -> aggregate must match the parquet-side oracle exactly."""
    from pyspark.sql import types as T

    sup = _t(spark, sf_dir, "supplier")
    # per-(sf_dir, process) staging like every other sink query: a
    # concurrent run (gate + bench, or another scale factor) must not
    # overwrite this run's files between the write and the read-back
    d = staging_dir("csv_roundtrip", sf_dir)
    write_csv(sup.select("s_suppkey", "s_nationkey", "s_acctbal"), d)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), False),
            T.StructField("s_nationkey", T.IntegerType(), False),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    )
    back = read_csv(spark, d, schema, header=True)
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("s_acctbal").cast("decimal(38,2)")), 2)
            .cast("double")
            .alias("bal"),
        )
        .orderBy("s_nationkey")
    )


@register(
    "json_roundtrip_agg",
    oracle="""
SELECT n_regionkey, count(*) AS n,
       min(n_name) AS first_nation, max(n_name) AS last_nation
FROM nation
GROUP BY n_regionkey ORDER BY n_regionkey
""",
)
def q_json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + schema'd JSON scan proven inside the oracle
    gate: nation -> JSON -> read back with an explicit schema ->
    aggregate must match the parquet-side oracle.  Schema-at-read keeps
    the scan single-pass (no inference job) — mandatory at scale."""
    from pyspark.sql import types as T

    nat = _t(spark, sf_dir, "nation")
    # per-(sf_dir, process) staging — see q_csv_roundtrip_agg
    d = staging_dir("json_roundtrip", sf_dir)
    write_json(nat, d)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), False),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), False),
        ]
    )
    back = read_json(spark, d, schema)
    return (
        back.groupBy("n_regionkey")
        .agg(
            F.count("*").alias("n"),
            F.min("n_name").alias("first_nation"),
            F.max("n_name").alias("last_nation"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join with selective predicates on both fact
    and dimension sides, grouped revenue, global top-10.  The segment
    filter prunes customer BEFORE the join (broadcast), and the date
    predicates push to the parquet scans — the plan every BI query
    wants at 100 TB."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_region_volume",
    oracle="""
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
""",
)
def q_tpch_q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join (fact + 5 dims) with the classic
    'customer and supplier in the same nation' equality folded into the
    supplier join, region filter driving dimension pruning.  All four
    dimension tables broadcast; lineitem/orders shuffle once on
    orderkey."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
SELECT c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o.o_totalprice, 2) AS totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 20
""",
)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate subquery driving a
    semi join (the large-order keys), then fact re-join + group.  The
    semi join ships only orderkeys — never the aggregated payload —
    and the big-order key set is small enough for AQE to broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "customer_scd2_batch",
    oracle="""
SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal,
       '2020-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
FROM customer WHERE c_mktsegment <> 'BUILDING'
UNION ALL
SELECT c_custkey, c_mktsegment, round(c_acctbal, 2),
       '2020-01-01', '2024-06-01'
FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT c_custkey, c_mktsegment, round(round(c_acctbal, 2) + 100, 2),
       '2024-06-01', CAST(NULL AS VARCHAR)
FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY c_custkey, valid_from
""",
)
def q_customer_scd2_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension merge: an update batch (every BUILDING customer's
    balance +100) closes the affected current rows and inserts new
    current rows, history preserved — the warehouse-dimension
    counterpart of upsert_customer_balances (which overwrites).  The
    oracle spells the expected merged table as three UNION branches."""
    from ..operators.scd import scd2_apply

    cust = _t(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("2020-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    updates = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.round("c_acctbal", 2) + 100, 2).alias("acctbal"),
    )
    out = scd2_apply(
        dim,
        updates,
        key_cols=["c_custkey"],
        attr_cols=["c_mktsegment", "acctbal"],
        batch_ts="2024-06-01",
    )
    return out.orderBy("c_custkey", "valid_from")


@register(
    "part_name_fuzzy_pairs",
    oracle="""
WITH names AS (SELECT p_name, count(*) AS n FROM part GROUP BY p_name),
b AS (SELECT p_name, n, string_split(p_name, ' ')[1] AS blk FROM names)
SELECT a.p_name AS name_a, c.p_name AS name_b,
       levenshtein(a.p_name, c.p_name) AS distance,
       a.n AS n_a, c.n AS n_b
FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
WHERE levenshtein(a.p_name, c.p_name) <= 3
ORDER BY name_a, name_b
""",
)
def q_part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution-style fuzzy matching: distinct part names,
    blocked on the first word (the classic blocking-key trick — the
    edit-distance comparison runs within blocks, never all-pairs), with
    Levenshtein <= 3 flagging probable variants.  Both engines implement
    the identical edit-distance recurrence, so even the fuzzy matcher
    is value-hash-checked.  At 100 TB the block key is the shuffle key;
    pick one with bounded block sizes (or add a length band) to keep
    the within-block quadratic term controlled."""
    part = _t(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").alias("n"))
    b = names.withColumn("blk", F.split("p_name", " ").getItem(0))
    a, c = b.alias("a"), b.alias("c")
    dist = F.levenshtein(F.col("a.p_name"), F.col("c.p_name"))
    return (
        a.join(c, (F.col("a.blk") == F.col("c.blk")) & (F.col("a.p_name") < F.col("c.p_name")))
        .withColumn("distance", dist)
        .filter(F.col("distance") <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("c.p_name").alias("name_b"),
            "distance",
            F.col("a.n").alias("n_a"),
            F.col("c.n").alias("n_b"),
        )
        .orderBy("name_a", "name_b")
    )


@register(
    "orc_roundtrip_agg",
    oracle="""
SELECT p_brand, count(*) AS n, CAST(round(sum(CAST(p_retailprice AS DECIMAL(38,2))), 2) AS DOUBLE) AS total_price
FROM part
WHERE p_size >= 25
GROUP BY p_brand ORDER BY p_brand
""",
)
def q_orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan proven inside the oracle gate: part -> ORC ->
    read back -> filtered aggregate must match the parquet-side oracle.
    The p_size predicate is applied on the ORC scan, exercising ORC
    predicate pushdown (stripe/row-group index skipping) — the second
    columnar format a landing zone typically needs besides parquet."""
    part = _t(spark, sf_dir, "part")
    # per-(sf_dir, process) staging — see q_csv_roundtrip_agg
    d = staging_dir("orc_roundtrip", sf_dir)
    write_orc(part.select("p_partkey", "p_brand", "p_size", "p_retailprice"), d)
    back = read_orc(spark, d).filter(F.col("p_size") >= 25)
    return (
        back.groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("p_retailprice").cast("decimal(38,2)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("p_brand")
    )


@register(
    "events_running_stats",
    oracle="""
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6) AS running_value,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS event_seq,
       round(coalesce(value - lag(value) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id), 0), 6)
         AS value_delta
FROM events
ORDER BY user_id, event_seq
""",
)
def q_events_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregates + lag over event time per user —
    the ordered-window shape (ROWS UNBOUNDED PRECEDING frame) no other
    query exercises.  One hash exchange on user_id, one in-partition
    sort; the frame is computed streamingly within each partition."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(wcum), 6).alias("running_value"),
            F.row_number().over(w).alias("event_seq"),
            # lag over value, not ts: the source timestamps are
            # nanosecond parquet and Spark/DuckDB coerce them to their
            # microsecond types with different sub-us tie handling, so
            # epoch differences are not cross-engine reproducible
            F.round(
                F.coalesce(F.col("value") - F.lag("value").over(w), F.lit(0.0)), 6
            ).alias("value_delta"),
        )
        .orderBy("user_id", "event_seq")
    )


@register(
    "asof_purchase_attribution",
    oracle="""
WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, event_id AS click_id, value AS click_value
      FROM events WHERE event_type = 'click'),
merged AS (
  SELECT user_id, ts, 1 AS side, event_id, value,
         NULL::BIGINT AS tb,
         NULL::STRUCT(click_id BIGINT, click_value DOUBLE) AS payload
  FROM p
  UNION ALL
  SELECT user_id, ts, 0, NULL, NULL, click_id,
         struct_pack(click_id := click_id, click_value := click_value)
  FROM c),
carried AS (
  SELECT user_id, side, event_id, value,
         last_value(payload IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts, side, tb NULLS FIRST
           ROWS UNBOUNDED PRECEDING) AS payload
  FROM merged)
SELECT event_id, user_id, round(value, 6) AS value,
       payload.click_id AS click_id,
       round(payload.click_value, 6) AS click_value
FROM carried WHERE side = 1
ORDER BY event_id
""",
)
def q_asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attributed to the user's most recent
    click at-or-before it (classic attribution / quote-to-trade shape).
    Runs as the union-merge pattern — one shuffle, no nested-loop theta
    join; the oracle replays the same semantics in SQL window form."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    out = asof_join(
        purchases,
        clicks,
        on="ts",
        by=["user_id"],
        right_cols=["click_id", "click_value"],
        tiebreak="click_id",
        suffix="",
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("value"),
        "click_id",
        F.round("click_value", 6).alias("click_value"),
    ).orderBy("event_id")


@register(
    "range_join_price_band",
    oracle="""
SELECT p_partkey, count(*) AS n_lines,
       round(sum(l_quantity), 2) AS sum_qty
FROM part
JOIN lineitem
  ON l_extendedprice / l_quantity BETWEEN p_retailprice - 0.05
                                      AND p_retailprice + 0.05
GROUP BY p_partkey
ORDER BY p_partkey
""",
)
def q_range_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key-free interval join: lineitems whose unit price falls in
    each part's +-0.05 retail-price band, via the bucketed range join
    (integer-bucket equi-join + residual filter) — never the
    BroadcastNestedLoopJoin Spark would plan for the bare BETWEEN.  The
    oracle runs the naive theta join; results must match exactly."""
    from ..operators.rangejoin import bucketed_range_join

    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice") - 0.05).alias("lo"),
        (F.col("p_retailprice") + 0.05).alias("hi"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        "l_quantity",
    )
    joined = bucketed_range_join(
        li, part, point_col="unit_price", lo_col="lo", hi_col="hi", bucket_width=0.1
    )
    return (
        joined.groupBy("p_partkey")
        .agg(F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy("p_partkey")
    )


H_UPD = duck_hash_sql("upd", "c_custkey")


@register(
    "upsert_customer_balances",
    oracle=f"""
WITH upd AS (
  SELECT c_custkey, c_name, c_nationkey,
         round(c_acctbal + 100.0, 2) AS c_acctbal
  FROM customer
  WHERE {H_UPD} < 0.3),
merged AS (
  SELECT *, 0 AS pri FROM (SELECT c_custkey, c_name, c_nationkey,
                                  round(c_acctbal, 2) AS c_acctbal FROM customer)
  UNION ALL
  SELECT *, 1 FROM upd)
SELECT c_custkey, c_name, c_nationkey, c_acctbal
FROM (SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY pri DESC) AS rn
      FROM merged)
WHERE rn = 1
ORDER BY c_custkey
""",
)
def q_upsert_customer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE without a table format: a deterministic 30% of
    customers get a balance correction; upsert keeps the corrected row
    per key and passes the rest through unchanged."""
    from ..functions.hashing import uniform_hash
    from ..operators.upsert import upsert

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    updates = (
        _t(spark, sf_dir, "customer")
        .filter(uniform_hash("c_custkey", salt="upd") < 0.3)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        )
    )
    return upsert(cust, updates, keys=["c_custkey"]).orderBy("c_custkey")


@register(
    "grouped_quantity_quartiles",
    oracle="""
SELECT l_returnflag,
       array_to_string([round(q, 6) for q in quantile_cont(l_quantity, [0.25, 0.5, 0.75])], ',')
         AS quartiles,
       (floor((avg(l_quantity)) * 1000000 + 0.5) / 1000000) AS mean_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_grouped_quantity_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentile vector (SURVEY A3 extended to groups).
    Exact percentile sorts within each group — fine keyed by a
    low-cardinality column; at 100 TB with high-cardinality groups use
    percentile_approx (Greenwald-Khanna, mergeable map-side).  The
    vector is emitted ','-joined: raw array cells crash the driver's
    pandas canonicalizer."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").alias("q"),
            det_round(F.avg("l_quantity")).alias("mean_qty"),
        )
        .select(
            "l_returnflag",
            F.array_join(
                F.transform("q", lambda x: F.round(x, 6)).cast("array<string>"), ","
            ).alias("quartiles"),
            "mean_qty",
        )
        .orderBy("l_returnflag")
    )


@register(
    "cube_flag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def q_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full grouping-set lattice in one pass (ExpandExec) — all four
    grouping combinations from a single scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "lineitem_profile",
    oracle="""
SELECT 'l_orderkey' AS "column", count(l_orderkey) AS n,
       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       count(DISTINCT l_orderkey) AS n_distinct,
       CAST(min(l_orderkey) AS VARCHAR) AS min_value,
       CAST(max(l_orderkey) AS VARCHAR) AS max_value
FROM lineitem
UNION ALL
SELECT 'l_quantity', count(l_quantity),
       CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT l_quantity),
       CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR)
FROM lineitem
UNION ALL
SELECT 'l_returnflag', count(l_returnflag),
       CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT l_returnflag),
       min(l_returnflag), max(l_returnflag)
FROM lineitem
ORDER BY "column"
""",
)
def q_lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column completeness/cardinality/range profile in ONE scan
    (single Aggregate + stack reshape) — the oracle spells it as three
    separate scans; results must agree exactly."""
    from ..operators.profile import table_profile

    li = _t(spark, sf_dir, "lineitem")
    return table_profile(li, ["l_orderkey", "l_quantity", "l_returnflag"]).orderBy("column")


@register(
    "salted_agg_per_part",
    oracle="""
SELECT l_partkey, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem GROUP BY l_partkey ORDER BY l_partkey
""",
)
def q_salted_agg_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (hot-key mitigation) must equal the
    plain aggregate exactly — the oracle IS the unsalted formulation."""
    from ..operators.skew import salted_agg

    li = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        key_cols=["l_partkey"],
        salt_cols=["l_orderkey", "l_linenumber"],
        aggs={
            "n": ("l_quantity", "count"),
            "sum_qty": ("l_quantity", "sum"),
            "max_price": ("l_extendedprice", "max"),
        },
        n_salts=16,
    )
    return out.select(
        "l_partkey",
        "n",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("max_price", 2).alias("max_price"),
    ).orderBy("l_partkey")


@register(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       (floor((avg(l_quantity)) * 1000000 + 0.5) / 1000000) AS avg_qty,
       (floor((avg(l_extendedprice)) * 1000000 + 0.5) / 1000000) AS avg_price,
       (floor((avg(l_discount)) * 1000000 + 0.5) / 1000000) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical wide-aggregate scan.  One pass,
    partial+final hash agg on a 2-value grouping key; the shipdate
    filter and 6-column projection reach the parquet scan (pushdown +
    pruning), which is what makes this cheap at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            det_round(F.avg("l_quantity")).alias("avg_qty"),
            det_round(F.avg("l_extendedprice")).alias("avg_price"),
            det_round(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "part_cooccurrence_top20",
    oracle=f"""
WITH capped AS ({_CAPPED_ROWS_SQL})
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
FROM capped a
JOIN capped b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
""",
)
def q_part_cooccurrence_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought in the same order.
    The self-join shuffles once on l_orderkey and fans out k^2/2 pairs
    per k-line order — at 100 TB the thing to bound is basket width,
    so baskets are capped at _BASKET_CAP rows (a no-op on uniform data,
    max basket 17; the round-8 skew probe's 15,963-part hot order is
    exactly the case the cap exists for).  Fully deterministic top-20
    via (count, part_a, part_b)."""
    li = _capped_rows(_t(spark, sf_dir, "lineitem"))
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "dq_lineitem_audit",
    oracle="""
SELECT 'accepted_values(l_returnflag)' AS rule,
       (SELECT count(*) FROM lineitem
        WHERE l_returnflag NOT IN ('A', 'N', 'R') OR l_returnflag IS NULL) AS violations
UNION ALL
SELECT 'in_range(l_discount,0,0.1)',
       (SELECT count(*) FROM lineitem
        WHERE l_discount IS NULL OR l_discount < 0 OR l_discount > 0.1)
UNION ALL
SELECT 'in_range(l_quantity,1,10)',
       (SELECT count(*) FROM lineitem
        WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 10)
UNION ALL
SELECT 'not_null(l_orderkey)',
       (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)
UNION ALL
SELECT 'refers_to(l_orderkey)',
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'satisfies(disc_price_le_base)',
       (SELECT count(*) FROM lineitem
        WHERE NOT coalesce(l_extendedprice * (1 - l_discount) <= l_extendedprice, FALSE))
UNION ALL
SELECT 'unique(l_orderkey,l_linenumber)',
       (SELECT CAST(coalesce(sum(cnt - 1), 0) AS BIGINT) FROM (
          SELECT count(*) AS cnt FROM lineitem
          GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1))
ORDER BY rule
""",
)
def q_dq_lineitem_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative table contract over lineitem: five row-level rules
    fused into one aggregate scan, plus a key-uniqueness shuffle and a
    referential-integrity anti-join.  The range rule on quantity is
    deliberately tight so the audit shows a nonzero violation count."""
    from ..operators import quality as Q

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rules = [
        Q.not_null("l_orderkey"),
        Q.accepted_values("l_returnflag", ["A", "N", "R"]),
        Q.in_range("l_discount", 0, 0.1),
        Q.in_range("l_quantity", 1, 10),
        Q.satisfies("disc_price_le_base", disc_price <= F.col("l_extendedprice")),
        Q.is_unique("l_orderkey", "l_linenumber"),
        Q.refers_to("l_orderkey", orders, "o_orderkey"),
    ]
    return Q.audit(li, rules).orderBy("rule")


@register(
    "price_histogram_20",
    oracle="""
WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem),
binned AS (
  SELECT least(CAST(floor((l_extendedprice - lo) / ((hi - lo) / 20)) AS INT), 19) AS bin,
         lo, hi
  FROM lineitem, b)
SELECT bin,
       round(lo + bin * ((hi - lo) / 20), 6) AS bin_lo,
       round(lo + (bin + 1) * ((hi - lo) / 20), 6) AS bin_hi,
       count(*) AS n
FROM binned
GROUP BY bin, lo, hi
ORDER BY bin
""",
)
def q_price_histogram_20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 20-bin histogram of extended price — bounds via
    broadcast one-row aggregate, bin arithmetic bit-identical across
    engines (same IEEE double ops on both sides)."""
    from ..operators.profile import value_histogram

    li = _t(spark, sf_dir, "lineitem")
    return value_histogram(li, "l_extendedprice", 20).orderBy("bin")


@register(
    "lineitem_metrics_unpivot",
    oracle="""
WITH w AS (
  SELECT l_returnflag,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         (floor((avg(l_discount)) * 1000000 + 0.5) / 1000000) AS avg_disc
  FROM lineitem GROUP BY 1)
SELECT l_returnflag, 'avg_disc' AS metric, avg_disc AS value FROM w
UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
UNION ALL SELECT l_returnflag, 'sum_qty', sum_qty FROM w
ORDER BY l_returnflag, metric
""",
)
def q_lineitem_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long melt (DataFrame.unpivot) of a per-flag metric row —
    the oracle derives the same long table with UNION ALL, so the two
    formulations check each other."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        det_round(F.avg("l_discount")).alias("avg_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "avg_disc"], "metric", "value"
    ).orderBy("l_returnflag", "metric")


@register(
    "top1_supplier_per_nation",
    oracle="""
SELECT s_nationkey,
       arg_max(s_name, s_acctbal) AS top_supplier,
       round(max(s_acctbal), 2) AS top_acctbal
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
""",
)
def q_top1_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass argmax (max_by) — top-1 per group WITHOUT a window
    sort: one partial-aggregating shuffle carries a single candidate per
    (group, task) instead of sorting every row.  (Ties: acctbal is
    unique per nation in this data; tie-sensitive callers should
    max_by over a (value, tiebreak) struct.)"""
    sup = _t(spark, sf_dir, "supplier")
    return (
        sup.groupBy("s_nationkey")
        .agg(
            F.max_by("s_name", "s_acctbal").alias("top_supplier"),
            F.round(F.max("s_acctbal"), 2).alias("top_acctbal"),
        )
        .orderBy("s_nationkey")
    )


_SQL_GROUPING_SETS = """
SELECT coalesce(l_returnflag, 'ALL') AS flag,
       coalesce(l_linestatus, 'ALL') AS status,
       grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gid,
       count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY gid, flag, status
"""


@register("grouping_sets_quantity", oracle=_SQL_GROUPING_SETS)
def q_grouping_sets_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not expressible as one rollup/cube):
    per-flag, per-status, and grand-total groups in a single pass, with
    grouping() disambiguating the NULL-as-ALL rows.  Identical SQL text
    runs on both engines."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SQL_GROUPING_SETS)


@register(
    "acctbal_peer_density",
    oracle="""
SELECT c_nationkey, c_custkey,
       count(*) OVER w AS n_peers,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,2))) OVER w, 2) AS DOUBLE)
         AS peer_balance
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal
             RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING)
ORDER BY c_nationkey, c_custkey
""",
)
def q_acctbal_peer_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-RANGE window frame (not ROWS): for every customer, how many
    same-nation customers sit within +/-500 of their balance.  RANGE
    frames are tie-safe by construction (all value-peers join the
    frame), so the result is deterministic without a tiebreak column."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal")
        .rangeBetween(-500, 500)
    )
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            F.count("*").over(w).alias("n_peers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(38,2)")).over(w), 2)
            .cast("double")
            .alias("peer_balance"),
        )
        .orderBy("c_nationkey", "c_custkey")
    )


@register(
    "acctbal_quartiles_per_nation",
    oracle="""
WITH tiled AS (
  SELECT c_nationkey, c_acctbal,
         ntile(4) OVER (PARTITION BY c_nationkey
                        ORDER BY c_acctbal, c_custkey) AS tile
  FROM customer)
SELECT c_nationkey, tile,
       count(*) AS n,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,2))), 2) AS DOUBLE) AS tile_balance,
       round(min(c_acctbal), 2) AS lo,
       round(max(c_acctbal), 2) AS hi
FROM tiled
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_acctbal_quartiles_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) quantile binning per nation (the distributed form of
    quantile feature bucketing) — full (value, key) tiebreak makes the
    tile assignment a total order, hence engine-independent."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select("c_nationkey", "c_acctbal", F.ntile(4).over(w).alias("tile"))
        .groupBy("c_nationkey", "tile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(38,2)")), 2)
            .cast("double")
            .alias("tile_balance"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
        .orderBy("c_nationkey", "tile")
    )


@register(
    "quantity_dispersion_stats",
    oracle="""
SELECT l_returnflag,
       round(median(l_quantity), 6) AS med_qty,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 6) AS cov_qty_price,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope_price_on_qty,
       round(regr_intercept(l_extendedprice, l_quantity), 6) AS icept_price_on_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_quantity_dispersion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family — interpolating median, sample
    stddev/variance, Pearson correlation, covariance, and OLS
    slope/intercept — all JVM-native partial-aggregating built-ins
    with identical textbook definitions on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.median(q), 6).alias("med_qty"),
            F.round(F.stddev_samp(q), 6).alias("sd_qty"),
            F.round(F.var_samp(q), 6).alias("var_qty"),
            F.round(F.corr(q, p), 6).alias("corr_qty_price"),
            F.round(F.covar_samp(q, p), 6).alias("cov_qty_price"),
            F.round(F.regr_slope(p, q), 6).alias("slope_price_on_qty"),
            F.round(F.regr_intercept(p, q), 6).alias("icept_price_on_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "embedding_norm_stats",
    oracle="""
WITH norms AS (
  SELECT vec_id, label,
         sqrt((SELECT sum(x * x) FROM unnest(CAST(embedding AS DOUBLE[])) AS t(x)))
           AS l2
  FROM embeddings),
q AS (SELECT label, l2,
             CAST(floor(l2 * 1000000) AS BIGINT) AS l2_micro
      FROM norms)
SELECT label,
       count(*) AS n,
       (floor((CAST(sum(l2_micro) AS DOUBLE) / count(*) / 1000000.0) * 1000000 + 0.5)
         / 1000000) AS avg_norm,
       round(min(l2), 6) AS min_norm,
       round(max(l2), 6) AS max_norm
FROM q
GROUP BY label
ORDER BY label
""",
)
def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm profile of the embedding column — the sanity
    pass before any cosine-based pipeline (un-normalized vectors break
    dot-product shortcuts).  Vectors are cast float->double BEFORE the
    arithmetic so per-term squares match the oracle bit-for-bit; the
    per-label MEAN quantizes each norm to integer micro-units first
    (floor(l2·1e6), exact BIGINT sum — the repo's micro-unit convention)
    because a raw float AVG folds in partial-aggregation order.  min/max
    are order-independent and stay plain round-6."""
    from ..functions.arrays import l2_norm
    from ..functions.rounding import det_round

    emb = _t(spark, sf_dir, "embeddings")
    vec_d = F.transform("embedding", lambda x: x.cast("double"))
    norms = emb.select("label", l2_norm(vec_d).alias("l2")).withColumn(
        "l2_micro", F.floor(F.col("l2") * 1000000).cast("long")
    )
    return (
        norms.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            det_round(
                F.sum("l2_micro").cast("double") / F.count("*") / F.lit(1000000.0), 6
            ).alias("avg_norm"),
            F.round(F.min("l2"), 6).alias("min_norm"),
            F.round(F.max("l2"), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


@register(
    "customer_order_gaps",
    oracle="""
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS seq,
       coalesce(date_diff('day', lag(o_orderdate) OVER w, o_orderdate), 0)
         AS days_since_prev,
       coalesce(date_diff('day', o_orderdate, lead(o_orderdate) OVER w), -1)
         AS days_to_next,
       strftime(first_value(o_orderdate) OVER w, '%Y-%m-%d') AS first_order,
       strftime(last_value(o_orderdate) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
                '%Y-%m-%d') AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, seq
""",
)
def q_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-history windows: lead/lag day gaps plus first_value /
    last_value (the latter over an explicitly unbounded frame — the
    default frame ends at CURRENT ROW, a classic silent-wrong-answer).
    Dates are midnight-aligned timestamps, so datediff is exact."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("seq"),
            F.coalesce(
                F.datediff("o_orderdate", F.lag("o_orderdate").over(w)), F.lit(0)
            ).alias("days_since_prev"),
            F.coalesce(
                F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate")),
                F.lit(-1),
            ).alias("days_to_next"),
            F.date_format(F.first("o_orderdate").over(w), "yyyy-MM-dd").alias(
                "first_order"
            ),
            F.date_format(F.last("o_orderdate").over(w_full), "yyyy-MM-dd").alias(
                "last_order"
            ),
        )
        .orderBy("o_custkey", "seq")
    )


_SQL_LATERAL_TOP_ORDER = """
SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS top_price
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
ORDER BY c.c_custkey
"""


@register("top_order_per_customer_lateral", oracle=_SQL_LATERAL_TOP_ORDER)
def q_top_order_per_customer_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY ... LIMIT — the
    dependent-join form of per-group top-1.  The identical SQL text
    runs on both engines; Catalyst decorrelates it to a window/join
    plan rather than a nested loop."""
    for t in ("customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_LATERAL_TOP_ORDER)


@register(
    "recency_weighted_customer_value",
    oracle="""
WITH mx AS (SELECT max(o_orderdate) AS anchor FROM orders),
w AS (
  SELECT o_custkey,
         o_totalprice * pow(0.5, date_diff('day', o_orderdate, anchor) / 365.0)
           AS decayed
  FROM orders, mx)
SELECT o_custkey,
       count(*) AS n_orders,
       round(sum(decayed), 2) AS decayed_value
FROM w
GROUP BY o_custkey
ORDER BY o_custkey
""",
)
def q_recency_weighted_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted customer value: each order's price decays with a
    1-year half-life from the corpus's newest order (anchor attached as
    a broadcast one-row aggregate — no collect).  The recsys-standard
    upgrade to the reference's recency-blind popularity scoring."""
    from ..functions.weighted import exp_decay
    from ..operators.relational import with_scalars

    orders = _t(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("anchor"))
    decayed = exp_decay(
        F.col("o_totalprice"),
        F.datediff(F.col("anchor"), F.col("o_orderdate")),
        365.0,
    )
    return (
        with_scalars(orders, anchor)
        .select("o_custkey", decayed.alias("decayed"))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("decayed"), 2).alias("decayed_value"),
        )
        .orderBy("o_custkey")
    )


@register(
    "events_trailing_30m_avg",
    oracle="""
SELECT event_id, user_id,
       count(*) OVER w AS n_in_window,
       (floor((avg(value) OVER w) * 1000000 + 0.5) / 1000000) AS trailing_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
ORDER BY user_id, epoch_us(ts), event_id
""",
)
def q_events_trailing_30m_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-minute moving average per user — a time-RANGE window
    frame over exact microsecond epochs (unix_micros == DuckDB
    epoch_us, verified by the dynamic-session oracle), so frame
    membership is bit-identical across engines.  ``ts`` lands as
    TIMESTAMP_NTZ from µs parquet; the cast to TIMESTAMP is wall-time-
    preserving because the session timezone is pinned to UTC
    (session.py), which is exactly DuckDB's naive-epoch semantics."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-1_800_000_000, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count("*").over(w).alias("n_in_window"),
            det_round(F.avg("value").over(w)).alias("trailing_avg"),
            us.alias("__us"),
        )
        .orderBy("user_id", "__us", "event_id")
        .drop("__us")
    )


@register(
    "part_name_string_features",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substr(p_name, 1, 3) AS prefix3,
       reverse(p_name) AS name_rev,
       replace(p_name, ' ', '_') AS name_snake,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
       length(p_name) AS name_len,
       levenshtein(p_name, p_type) AS dist_to_type
FROM part
WHERE p_partkey % 17 = 0
ORDER BY p_partkey
""",
)
def q_part_name_string_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function family (upper / substr / reverse /
    replace / lpad / length / levenshtein) — identical semantics on
    both engines, checked value-for-value."""
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_partkey") % 17 == 0)
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.substring("p_name", 1, 3).alias("prefix3"),
            F.reverse("p_name").alias("name_rev"),
            F.regexp_replace("p_name", " ", "_").alias("name_snake"),
            F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
            F.length("p_name").alias("name_len"),
            F.levenshtein("p_name", "p_type").alias("dist_to_type"),
        )
        .orderBy("p_partkey")
    )


@register(
    "winsorized_price_stats",
    oracle="""
WITH b AS (
  SELECT l_returnflag AS rf,
         quantile_cont(l_extendedprice, 0.01) AS p01,
         quantile_cont(l_extendedprice, 0.99) AS p99
  FROM lineitem GROUP BY 1),
c AS (
  SELECT l.l_returnflag,
         l.l_extendedprice AS raw,
         least(greatest(l.l_extendedprice, b.p01), b.p99) AS clipped
  FROM lineitem l JOIN b ON b.rf = l.l_returnflag)
SELECT l_returnflag,
       (floor((avg(raw)) * 1000000 + 0.5) / 1000000) AS avg_raw,
       (floor((avg(clipped)) * 1000000 + 0.5) / 1000000) AS avg_winsorized,
       CAST(sum(CASE WHEN clipped <> raw THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
FROM c
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (percentile clipping): per-group exact p01/p99
    bounds join back as a broadcast, values clip via least/greatest —
    the standard tail-taming pass before training on heavy-tailed
    features.  Interpolating percentile matches quantile_cont."""
    li = _t(spark, sf_dir, "lineitem")
    bounds = li.groupBy(F.col("l_returnflag").alias("rf")).agg(
        F.percentile("l_extendedprice", F.lit(0.01)).alias("p01"),
        F.percentile("l_extendedprice", F.lit(0.99)).alias("p99"),
    )
    clipped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("p01")), F.col("p99")
    )
    return (
        li.join(F.broadcast(bounds), li.l_returnflag == bounds.rf)
        .select("l_returnflag", F.col("l_extendedprice").alias("raw"), clipped.alias("clipped"))
        .groupBy("l_returnflag")
        .agg(
            det_round(F.avg("raw")).alias("avg_raw"),
            det_round(F.avg("clipped")).alias("avg_winsorized"),
            F.sum(F.when(F.col("clipped") != F.col("raw"), 1).otherwise(0)).alias(
                "n_clipped"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "tpch_q4_priority_check",
    oracle="""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def q_tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (ref: the EXISTS-correlated priority count): a
    non-equi correlated EXISTS becomes a left-semi join whose condition
    carries both the key equality and the date comparison — Spark ships
    only (orderkey, shipdate) to the semi side, dedups by key during
    the join, and never materializes the subquery.  The date window
    pushes to the orders scan."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q10_returned_revenue",
    oracle="""
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       round(c.c_acctbal, 2) AS acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q_tpch_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking of customers who returned
    goods in a quarter.  Both selective predicates (date window, return
    flag) push to the two fact scans before the orderkey join; customer
    and nation broadcast; one shuffle total on orderkey, then a grouped
    top-20."""
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
WITH j AS (
  SELECT p.p_type, l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-02-01'),
s AS (
  SELECT round(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END), 2) AS promo_rev,
         round(sum(rev), 2) AS total_rev
  FROM j)
SELECT promo_rev, total_rev,
       (floor((100.0 * promo_rev / total_rev) * 1000000 + 0.5) / 1000000) AS promo_pct
FROM s
""",
)
def q_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share for one month — a
    conditional aggregate ratio.  Both sums come out of ONE pass (no
    second scan for the denominator); each sum is rounded to cents
    before the division so the ratio is bit-stable across engines and
    partition orders."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)), 2
            ).alias("promo_rev"),
            F.round(F.sum(rev), 2).alias("total_rev"),
        )
        .select(
            "promo_rev",
            "total_rev",
            det_round(100.0 * F.col("promo_rev") / F.col("total_rev")).alias(
                "promo_pct"
            ),
        )
    )


@register(
    "tpch_q16_supplier_variety",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT IN ('PROMO', 'ECONOMY')
  AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q_tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers stock each surviving
    (brand, type, size) combination, with NOT-IN / inequality dimension
    filters.  The part filters cut the broadcast side BEFORE the join,
    so the fact scan only keeps matching partkeys; count(DISTINCT)
    shuffles the already-reduced (group, suppkey) pairs once."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q22_idle_balances",
    oracle="""
WITH t AS (
  SELECT (floor((avg(c_acctbal)) * 100 + 0.5) / 100) AS thr FROM customer WHERE c_acctbal > 0.0)
SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c, t
WHERE c.c_acctbal > t.thr
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
)
def q_tpch_q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers who never placed an URGENT order
    (every testdata customer has SOME order, so the classic
    no-orders-at-all predicate would be vacuous here) — a scalar
    aggregate subquery (average positive balance, rounded to cents so
    the threshold is identical across engines) re-entering as a filter,
    then an anti join against orders, grouped by segment.  The anti
    join ships only custkeys; the scalar re-enters via a broadcast
    1-row cross join, not a collect."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    thr = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(det_round(F.avg("c_acctbal"), 2).alias("thr"))
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def _pagerank_sql(iters: int, damping: float = 0.85) -> str:
    """Unrolled integer micro-unit PageRank iterations as DuckDB CTEs —
    rank DIV outdeg and (pct*sum) DIV 100 are floor divisions on
    BIGINTs, bit-identical to the Spark side with no float rounding
    anywhere (see operators.graph.pagerank)."""
    pct = int(round(damping * 100))
    reset = 1_000_000 - pct * 10_000
    parts = [
        f"""cbk AS ({_CAPPED_BASKETS_SQL}),
pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM cbk a
  JOIN cbk b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
nodes AS (SELECT DISTINCT l_partkey AS id FROM lineitem),
deg AS (SELECT u, count(*) AS outdeg FROM pairs GROUP BY 1),
pr0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pru FROM nodes)"""
    ]
    for t in range(1, iters + 1):
        parts.append(f"""
c{t} AS (
  SELECT p.v AS id, CAST(sum(pr.pru // d.outdeg) AS BIGINT) AS s
  FROM pairs p JOIN pr{t - 1} pr ON pr.id = p.u JOIN deg d ON d.u = p.u
  GROUP BY 1),
pr{t} AS (
  SELECT n.id, CAST({reset} + ({pct} * coalesce(c.s, 0)) // 100 AS BIGINT) AS pru
  FROM nodes n LEFT JOIN c{t} c ON c.id = n.id)""")
    return ",".join(parts)


_PR_ITERS = 3


@register(
    "part_pagerank",
    oracle=f"""
WITH {_pagerank_sql(_PR_ITERS)}
SELECT id AS l_partkey, CAST(pru AS DOUBLE) / 1000000 AS pagerank
FROM pr{_PR_ITERS}
ORDER BY l_partkey
""",
)
def q_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (parts linked when they
    appear in the same order, both directions) — the iterative-algorithm
    capability under the FULL value-hash gate: operators.graph.pagerank
    runs GraphX-style N-scaled ranks in integer micro-units, so three
    distributed sweeps agree with the oracle's unrolled CTEs on every
    vertex, bit for bit."""
    from ..operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # basket cap before the k^2 pair join (no-op on uniform data; see
    # _BASKET_CAP) — nodes stay UNcapped so every part keeps a rank row
    dk = _capped_baskets(li).localCheckpoint(eager=False)
    a, b = dk.alias("a"), dk.alias("b")
    # packed single-long pair key for the distinct (8-byte vs 16-byte
    # shuffle key over the k^2 join fan-out; partkeys < 2^31)
    pk = F.col("a.l_partkey") * F.lit(4294967296).cast("long") + F.col("b.l_partkey")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(pk.alias("pk"))
        .distinct()
        .select(
            F.expr("pk DIV 4294967296").alias("u"),
            (F.col("pk") % 4294967296).alias("v"),
        )
    )
    nodes = li.select(F.col("l_partkey").alias("id")).distinct()
    return (
        pagerank(nodes, pairs, "id", "u", "v", iterations=_PR_ITERS)
        .select(F.col("id").alias("l_partkey"), "pagerank")
        .orderBy("l_partkey")
    )


@register(
    "price_histogram_equidepth",
    oracle="""
WITH t AS (
  SELECT l_extendedprice AS p,
         ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS decile
  FROM lineitem)
SELECT decile, count(*) AS n,
       round(min(p), 6) AS lo, round(max(p), 6) AS hi
FROM t GROUP BY decile ORDER BY decile
""",
)
def q_price_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (the optimizer-statistics / data-profiling
    companion to the fixed-width one): exact ntile(10) deciles over a
    TOTAL order — (price, orderkey, linenumber) is unique, so tile
    boundaries are deterministic, not tie-broken by partition luck.

    The plan is NOT a global ntile window (which executes on a single
    WindowExec partition — the scale cliff the round-2 verdict flagged):
    ranks come from operators.relational.global_rank (range partition +
    per-partition dense ids + broadcast offset join; no WindowExec
    anywhere, asserted by test_equidepth_no_single_partition_window),
    and the decile is ntile's closed form over (rank, N): the first
    N % 10 tiles hold N DIV 10 + 1 rows, the rest N DIV 10."""
    from ..operators.relational import global_rank, with_scalars

    li = _t(spark, sf_dir, "lineitem")
    ranked = global_rank(
        li.select(
            F.col("l_extendedprice").alias("p"), "l_orderkey", "l_linenumber"
        ),
        ["p", "l_orderkey", "l_linenumber"],
        rank_col="__r",
    )
    n_total = li.agg(F.count("*").alias("__N"))
    decile = F.expr(
        "CASE WHEN __r <= (__N DIV 10 + 1) * (__N % 10) "
        "THEN (__r + __N DIV 10) DIV (__N DIV 10 + 1) "
        "ELSE __N % 10 + (__r - (__N DIV 10 + 1) * (__N % 10) + __N DIV 10 - 1) "
        "     DIV (__N DIV 10) END"
    )
    return (
        with_scalars(ranked, n_total)
        .select("p", decile.cast("int").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("p"), 6).alias("lo"),
            F.round(F.max("p"), 6).alias("hi"),
        )
        .orderBy("decile")
    )


def _pagerank_weighted_sql(iters: int, damping: float = 0.85) -> str:
    """Unrolled WEIGHTED integer micro-unit PageRank CTEs: contribution
    along an edge is (pru * w) // wtot — see graph.pagerank_weighted."""
    pct = int(round(damping * 100))
    reset = 1_000_000 - pct * 10_000
    parts = [
        f"""cbk AS ({_CAPPED_BASKETS_SQL}),
pairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS w
  FROM cbk a
  JOIN cbk b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2),
nodes AS (SELECT DISTINCT l_partkey AS id FROM lineitem),
wt AS (SELECT u, CAST(sum(w) AS BIGINT) AS wtot FROM pairs GROUP BY 1),
pr0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pru FROM nodes)"""
    ]
    for t in range(1, iters + 1):
        parts.append(f"""
c{t} AS (
  SELECT p.v AS id, CAST(sum((pr.pru * p.w) // wt.wtot) AS BIGINT) AS s
  FROM pairs p JOIN pr{t - 1} pr ON pr.id = p.u JOIN wt ON wt.u = p.u
  GROUP BY 1),
pr{t} AS (
  SELECT n.id, CAST({reset} + ({pct} * coalesce(c.s, 0)) // 100 AS BIGINT) AS pru
  FROM nodes n LEFT JOIN c{t} c ON c.id = n.id)""")
    return ",".join(parts)


@register(
    "part_pagerank_weighted",
    oracle=f"""
WITH {_pagerank_weighted_sql(_PR_ITERS)}
SELECT id AS l_partkey, CAST(pru AS DOUBLE) / 1000000 AS pagerank
FROM pr{_PR_ITERS}
ORDER BY l_partkey
""",
)
def q_part_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the part co-purchase graph: edge weight =
    number of distinct orders the pair shares, so frequently co-bought
    parts pull proportionally more rank — rank splits by integer
    (pru * w) DIV wtot, keeping every vertex bit-identical to the
    oracle's unrolled CTEs."""
    from ..operators.graph import pagerank_weighted

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # dedupe (order, part) FIRST: after it, 'distinct orders per pair'
    # is a plain count — the k^2 pair aggregate then runs without
    # per-group distinct-set state (one cheap 600k-row distinct replaces
    # distinct machinery on 10M+ pair groups).  Baskets capped before
    # the pair join (no-op on uniform data; see _BASKET_CAP)
    dk = _capped_baskets(li).localCheckpoint(eager=False)
    a, b = dk.alias("a"), dk.alias("b")
    # pack the pair into one long for the weight aggregate (same trick as
    # ngram_jaccard_pairs: 8-byte vs 16-byte grouping key over the k^2
    # join fan-out); partkeys are < 2^31
    pk = F.col("a.l_partkey") * F.lit(4294967296).cast("long") + F.col("b.l_partkey")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(pk.alias("pk"))
        .groupBy("pk")
        .agg(F.count("*").cast("long").alias("w"))
        .select(
            F.expr("pk DIV 4294967296").alias("u"),
            (F.col("pk") % 4294967296).alias("v"),
            "w",
        )
    )
    nodes = li.select(F.col("l_partkey").alias("id")).distinct()
    return (
        pagerank_weighted(nodes, pairs, "id", "u", "v", "w", iterations=_PR_ITERS)
        .select(F.col("id").alias("l_partkey"), "pagerank")
        .orderBy("l_partkey")
    )


@register(
    "events_seq_pattern",
    oracle="""
WITH p AS (SELECT event_id, user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
chain AS (
  SELECT p.event_id, p.user_id, p.p_ts,
         (SELECT max(c.ts) FROM events c
          WHERE c.event_type = 'click' AND c.user_id = p.user_id
            AND c.ts <= p.p_ts) AS c_ts
  FROM p),
chain2 AS (
  SELECT event_id, user_id, p_ts, c_ts,
         (SELECT max(v.ts) FROM events v
          WHERE v.event_type = 'view' AND v.user_id = chain.user_id
            AND v.ts <= chain.c_ts) AS v_ts
  FROM chain WHERE c_ts IS NOT NULL)
SELECT event_id, user_id,
       strftime(p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(c_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       strftime(v_ts, '%Y-%m-%d %H:%M:%S') AS view_ts
FROM chain2
WHERE v_ts IS NOT NULL AND v_ts >= p_ts - INTERVAL 24 HOUR
ORDER BY event_id
""",
)
def q_events_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence detection: purchases completing a
    view -> click -> purchase pattern within 24 hours, per user.

    Greedy-latest chaining is EXACT here, not a heuristic: for a fixed
    terminal event, taking the latest click at-or-before it, then the
    latest view at-or-before that click, maximizes the view timestamp
    over all valid chains (any earlier click only pushes the reachable
    view earlier) — so the pattern completes for SOME chain iff it
    completes for the greedy one.  That turns sequence matching into
    two chained as-of joins (union-merge, one shuffle each, no
    quadratic self-join), while the oracle replays the same semantics
    as correlated max() subqueries."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("c_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("ts").alias("v_ts")
    )
    s1 = asof_join(
        purchases, clicks, on="ts", by=["user_id"], right_cols=["c_ts"], suffix=""
    ).filter(F.col("c_ts").isNotNull())
    s2 = asof_join(
        s1.select("event_id", "user_id", F.col("ts").alias("p_ts"), F.col("c_ts").alias("ts")),
        views,
        on="ts",
        by=["user_id"],
        right_cols=["v_ts"],
        suffix="",
    )
    return (
        s2.filter(
            F.col("v_ts").isNotNull()
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 hours"))
        )
        .select(
            "event_id",
            "user_id",
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        )
        .orderBy("event_id")
    )


@register(
    "nation_price_regression",
    oracle="""
WITH sums AS (
  SELECT n.n_name AS nation,
         count(*) AS n,
         CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))
                  * CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1)
SELECT nation, n,
       (floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1000000 + 0.5) / 1000000)
         AS slope,
       (floor(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) * 1000000 + 0.5)
         / 1000000) AS intercept,
       (floor((((n * sxy - sx * sy) * (n * sxy - sx * sy))
               / ((n * sxx - sx * sx) * (n * syy - sy * sy))) * 1000000 + 0.5) / 1000000)
         AS r2
FROM sums
ORDER BY nation
""",
)
def q_nation_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-per-group: closed-form OLS of extended price on quantity,
    per supplier nation — slope, intercept, r².  Grouped regression is
    ONE aggregate producing exact-DECIMAL moment sums (n, Σx, Σy, Σxy,
    Σx², Σy² — order-independent), each converted to double ONCE, with
    the normal-equation arithmetic then running on identical doubles in
    both engines (det_round on the outputs).  No per-group model
    fitting loop, no Python: the moments pattern is how you fit millions
    of tiny models at 100 TB — map-side-combined sums, never a
    per-group data materialization."""
    from ..functions.rounding import det_round

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    sums = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(x * y).cast("double").alias("sxy"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(y * y).cast("double").alias("syy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        "nation",
        "n",
        det_round(slope).alias("slope"),
        det_round((sy - slope * sx) / n).alias("intercept"),
        det_round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
    ).orderBy("nation")


@register(
    "schema_evolution_roundtrip",
    oracle="""
SELECT c_nationkey, count(*) AS n,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,2))), 2) AS DOUBLE) AS bal,
       CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pre_evolution
FROM (
  SELECT c_custkey, c_nationkey, c_acctbal, NULL AS c_mktsegment
  FROM customer WHERE c_custkey % 2 = 0
  UNION ALL BY NAME
  SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 2 = 1)
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def q_schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the source layer: a dataset written in two
    generations — v1 without a column, v2 with it added — read back as
    ONE table via mergeSchema (parquet schema merging), old rows
    surfacing NULL for the new column.  This is how long-lived 100 TB
    datasets actually look; a reader that can't merge footers forces a
    full rewrite on every schema change.  The aggregate proves both
    generations landed (n_pre_evolution counts v1 rows) and values
    survived."""
    cust = _t(spark, sf_dir, "customer")
    # path is per-(sf_dir, process): concurrent invocations (gate + bench,
    # or different scale factors) must not interleave their overwrite-
    # then-append sequences into one mixed dataset
    d = staging_dir("schema_evolution", sf_dir)
    v1 = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    v2 = cust.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    v1.write.mode("overwrite").parquet(d)
    v2.write.mode("append").parquet(d)
    back = spark.read.option("mergeSchema", "true").parquet(d)
    return (
        back.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(38,2)")), 2)
            .cast("double")
            .alias("bal"),
            F.sum(F.col("c_mktsegment").isNull().cast("long")).alias("n_pre_evolution"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "benford_price_screen",
    oracle="""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS d
  FROM orders WHERE o_totalprice > 0),
n AS (SELECT count(*) AS total FROM digits)
SELECT d AS leading_digit, count(*) AS n_orders,
       (floor((count(*) * 1.0 / total) * 1000000 + 0.5) / 1000000) AS observed_freq,
       (floor(log10(1.0 + 1.0 / d) * 1000000 + 0.5) / 1000000) AS benford_freq
FROM digits, n
GROUP BY d, total
ORDER BY d
""",
)
def q_benford_price_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen over order totals — the classic
    fraud/synthetic-data detector (first significant digits of natural
    amounts follow log10(1 + 1/d)).  The leading digit is extracted
    EXACTLY: amounts convert to integer cents first, then to a string —
    never via log10-of-double (whose floor can sit on either side at
    powers of ten) and never via double rendering (engines format
    doubles differently).  Frequencies det_round; expected Benford
    freqs computed from the same log10 on identical small operands."""
    from ..functions.rounding import det_round

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    digits = orders.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("d")
    )
    total = digits.agg(F.count("*").alias("total"))
    return (
        digits.groupBy("d")
        .agg(F.count("*").alias("n_orders"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("d").alias("leading_digit"),
            "n_orders",
            det_round(F.col("n_orders") / F.col("total")).alias("observed_freq"),
            det_round(F.log10(1.0 + 1.0 / F.col("d"))).alias("benford_freq"),
        )
        .orderBy("leading_digit")
    )


@register(
    "events_cohort_retention",
    oracle="""
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1),
sizes AS (SELECT cohort, count(*) AS cohort_size FROM first GROUP BY 1),
act AS (
  SELECT f.cohort, d.day - f.cohort AS day_offset,
         count(DISTINCT d.user_id) AS n_active
  FROM d JOIN first f USING (user_id) GROUP BY 1, 2)
SELECT strftime(a.cohort, '%Y-%m-%d') AS cohort_day,
       CAST(a.day_offset AS BIGINT) AS day_offset,
       a.n_active,
       s.cohort_size,
       (floor(a.n_active * 1.0 / s.cohort_size * 1000000 + 0.5) / 1000000) AS retention
FROM act a JOIN sizes s USING (cohort)
ORDER BY 1, 2
""",
)
def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day, the
    share of each cohort active again N days later.  Three hash-
    partitioned aggregates (user-day distinct, first-day per user,
    cohort x offset counts) — no windows, so the plan scales with
    users x active-days and every shuffle key is high-cardinality."""
    ev = _t(spark, sf_dir, "events")
    d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = d.groupBy("user_id").agg(F.min("day").alias("cohort"))
    sizes = first.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    act = (
        d.join(first, "user_id")
        .groupBy("cohort", F.datediff("day", "cohort").alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        act.join(sizes, "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            "n_active",
            "cohort_size",
            det_round(F.col("n_active") / F.col("cohort_size")).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "events_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events),
t AS (SELECT event_type, next_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS row_total FROM t GROUP BY 1)
SELECT t.event_type, t.next_type, t.n,
       (floor(t.n * 1.0 / tot.row_total * 1000000 + 0.5) / 1000000) AS p
FROM t JOIN tot USING (event_type)
ORDER BY 1, 2
""",
)
def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) — the sequence-model
    feature table.  One lead window partitioned by user (the natural
    high-cardinality key), then two small aggregates over the
    |types|^2 transition space."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    t = seq.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
    tot = t.groupBy("event_type").agg(F.sum("n").alias("row_total"))
    return (
        t.join(tot, "event_type")
        .select(
            "event_type",
            "next_type",
            "n",
            det_round(F.col("n") / F.col("row_total")).alias("p"),
        )
        .orderBy("event_type", "next_type")
    )


@register(
    "incremental_rollup_maintenance",
    oracle="""
WITH full_ AS (
  SELECT o_orderpriority, o_orderstatus,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_price,
         min(o_totalprice) AS min_price,
         max(o_totalprice) AS max_price
  FROM orders GROUP BY 1, 2),
delta AS (
  SELECT o_orderpriority, o_orderstatus, count(*) AS n_delta
  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01' GROUP BY 1, 2)
SELECT f.o_orderpriority, f.o_orderstatus, f.n_orders, f.total_price,
       f.min_price, f.max_price,
       (floor((CAST(f.total_price AS DOUBLE) / f.n_orders) * 1000000 + 0.5)
          / 1000000) AS avg_price,
       COALESCE(d.n_delta, 0) AS n_delta
FROM full_ f LEFT JOIN delta d
  ON f.o_orderpriority = d.o_orderpriority
 AND f.o_orderstatus = d.o_orderstatus
ORDER BY 1, 2
""",
)
def q_incremental_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the rollup is answered from a
    PERSISTED state table of history partials plus the new delta's
    partials — history raw rows are never rescanned — yet must equal the
    oracle's full recompute exactly.  That equality is the monoid-merge
    law the whole 100-TB nightly-rollup architecture rests on
    (operators/incremental.py); the sum partial is DECIMAL so the
    reassociation is bit-exact, and the non-monoid mean is derived only
    at finalize time.  The reference recomputes its popularity aggregate
    from the full ratings file every run (popularity_model.py:43-50);
    this is that run at production scale."""
    from ..operators.incremental import finalize_state, merge_states, rollup_state

    cutoff = "1997-06-01"
    orders = _t(spark, sf_dir, "orders")
    keys = ["o_orderpriority", "o_orderstatus"]
    # nightly-build leg: state over history, persisted as a parquet state
    # table (per-(sf_dir, pid) scratch so gate+bench runs can't collide)
    d = staging_dir("rollup_state", sf_dir)
    history = orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
    rollup_state(history, keys, "o_totalprice").write.mode("overwrite").parquet(d)
    # incremental leg: fold ONLY the delta into the read-back state
    delta = orders.filter(F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp"))
    delta_state = rollup_state(delta, keys, "o_totalprice")
    merged = merge_states([spark.read.parquet(d), delta_state], keys)
    out = finalize_state(merged, keys)
    n_delta = delta_state.select(*keys, F.col("st_n").alias("n_delta"))
    return (
        out.join(n_delta, keys, "left")
        .select(
            *keys,
            F.col("n_rows").alias("n_orders"),
            F.col("total").cast("double").alias("total_price"),
            F.col("vmin").alias("min_price"),
            F.col("vmax").alias("max_price"),
            det_round(F.col("mean")).alias("avg_price"),
            F.coalesce(F.col("n_delta"), F.lit(0)).alias("n_delta"),
        )
        .orderBy(*keys)
    )


@register(
    "interval_overlap_ship_windows",
    oracle="""
WITH a AS (
  SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS order_month,
         epoch(o_orderdate) AS alo, epoch(o_orderdate) + 259200 AS ahi
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'),
b AS (
  SELECT l_orderkey, l_linenumber,
         epoch(l_shipdate) AS blo, epoch(l_shipdate) + 172800 AS bhi
  FROM lineitem
  WHERE l_returnflag = 'R'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01')
SELECT order_month, count(*) AS n_pairs,
       count(DISTINCT o_orderkey) AS n_orders,
       count(DISTINCT concat_ws('-', l_orderkey, l_linenumber)) AS n_items
FROM a JOIN b ON a.alo <= b.bhi AND b.blo <= a.ahi
GROUP BY order_month
ORDER BY order_month
""",
)
def q_interval_overlap_ship_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-interval overlap join (operators/rangejoin.py): 3-day
    urgent-order handling windows vs 2-day return-shipment windows,
    paired whenever they overlap in time.  The oracle is the naive
    theta join; the engine's plan is the bucketed equi-join with
    canonical-bucket pair emission — a hash join on an integer key
    instead of BroadcastNestedLoopJoin, which is the difference between
    O(n*m) and O(overlaps) at 100 TB."""
    from ..operators.rangejoin import bucketed_interval_overlap_join

    day = 86400
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.unix_timestamp("o_orderdate").alias("alo"),
            (F.unix_timestamp("o_orderdate") + 3 * day).alias("ahi"),
        )
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.unix_timestamp("l_shipdate").alias("blo"),
            (F.unix_timestamp("l_shipdate") + 2 * day).alias("bhi"),
        )
    )
    pairs = bucketed_interval_overlap_join(
        o, li, "alo", "ahi", "blo", "bhi", bucket_width=7 * day
    )
    return (
        pairs.groupBy("order_month")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.countDistinct(
                F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
            ).alias("n_items"),
        )
        .orderBy("order_month")
    )


@register(
    "text_log_roundtrip_agg",
    oracle="""
SELECT event_type, count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro,
       max(strftime(ts, '%Y-%m-%d %H:%M:%S.%f')) AS last_ts
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_text_log_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-text source/sink roundtrip (sources read_text/write_text):
    events serialized to pipe-delimited log lines, written as plain
    text, scanned back schema-free, re-parsed with split(), and
    aggregated — the flat-file ingestion path every log pipeline
    starts from.  Values cross the text boundary as integer micro-units
    and fixed-format timestamps, so the roundtrip is bit-lossless and
    the oracle can aggregate the ORIGINAL table directly: any
    serialize/parse drift breaks the hash."""
    from ..sources.readers import read_text
    from ..sources.writers import write_text

    ev = _t(spark, sf_dir, "events")
    d = staging_dir("text_log", sf_dir)
    lines = ev.select(
        F.concat_ws(
            "|",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            F.col("user_id"),
            F.col("event_type"),
            F.floor(F.col("value") * 1_000_000).cast("long"),
        ).alias("value")
    )
    write_text(lines, d)
    parts = F.split(F.col("value"), r"\|")
    parsed = read_text(spark, d).select(
        parts.getItem(0).alias("ts_s"),
        parts.getItem(1).cast("long").alias("user_id"),
        parts.getItem(2).alias("event_type"),
        parts.getItem(3).cast("long").alias("micro"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("micro").alias("sum_micro"),
            F.max("ts_s").alias("last_ts"),
        )
        .orderBy("event_type")
    )


@register(
    "part_triangle_count",
    oracle=f"""
WITH capped AS ({_CAPPED_ROWS_SQL}),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS w
  FROM capped a JOIN capped b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
e AS (SELECT pa AS a, pb AS b FROM pairs WHERE w >= 2),
deg AS (SELECT x, count(*) AS d FROM
          (SELECT a AS x FROM e UNION ALL SELECT b AS x FROM e) GROUP BY x)
SELECT (SELECT count(*) FROM deg) AS n_vertices,
       (SELECT count(*) FROM e) AS n_edges,
       (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
       (SELECT count(*)
        FROM e e1 JOIN e e2 ON e1.b = e2.a
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
""",
)
def q_part_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (edges = part
    pairs co-ordered at least twice): operators/graph.py::
    triangle_count, the degree-ORIENTED wedge join whose fan-out is
    bounded by sum(d_out^2) <= O(m^1.5) on any graph — hub vertices
    never enumerate their d^2 wedge pairs, which is what detonates the
    naive spelling on power-law 100-TB graphs.  The oracle counts the
    same triangles the simple a<b<c way; equality proves the
    orientation trick loses and double-counts nothing.  Baskets are
    capped at _BASKET_CAP rows before the edge-building self-join (no-op
    on uniform data; bounds the hot-order pair fanout under skew)."""
    from ..operators.graph import triangle_count

    li = _capped_rows(_t(spark, sf_dir, "lineitem"))
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )
    return triangle_count(edges)


@register(
    "customer_pareto_frontier",
    oracle="""
WITH prof AS (
  SELECT o_custkey AS c_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS spend_cents,
         count(*) AS n_orders
  FROM orders GROUP BY 1)
SELECT c_custkey, spend_cents, n_orders
FROM prof p
WHERE NOT EXISTS (
  SELECT 1 FROM prof q
  WHERE q.spend_cents >= p.spend_cents AND q.n_orders >= p.n_orders
    AND (q.spend_cents > p.spend_cents OR q.n_orders > p.n_orders))
ORDER BY c_custkey
""",
)
def q_customer_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline: customers not dominated on (total spend, order count).
    The oracle runs the O(n^2) NOT-EXISTS dominance definition; the
    engine runs the 2-D staircase plan (operators/relational.py::
    pareto_frontier_2d): max-per-x aggregate, strict-prefix running max
    over x DESC via global_cummax_strict (range partition + bounded
    triangular offsets — NO single-partition WindowExec), one filter —
    three shuffles at any n.  Spend is exact integer cents (DECIMAL sum
    * 100 -> BIGINT) so the dominance comparisons are integer-exact."""
    from ..operators.relational import pareto_frontier_2d

    orders = _t(spark, sf_dir, "orders")
    prof = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("spend_cents"),
        F.count("*").alias("n_orders"),
    )
    return pareto_frontier_2d(prof, "spend_cents", "n_orders").orderBy("c_custkey")


# deterministic synthetic "second load" for the CDC diff: content-hash
# u in [0,1) per customer key decides the row's fate in snapshot v2 —
# u < 0.05 deleted, 0.05 <= u < 0.15 balance bumped by 100.00, and the
# u >= 0.95 tail cloned as inserts under key+10M.  Bit-identical on
# both engines (md5 hash, double add of exact operands).
_CDC_U = (
    "(CAST(('0x' || substr(md5(concat_ws(chr(1), 'cdc', "
    "CAST(c_custkey AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0)"
)


@register(
    "customer_snapshot_diff",
    oracle=f"""
WITH v1 AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
h AS (SELECT c_custkey, {_CDC_U} AS u FROM customer),
v2 AS (
  SELECT v1.c_custkey,
         CASE WHEN u < 0.15 THEN c_acctbal + 100.0 ELSE c_acctbal END
           AS c_acctbal,
         c_mktsegment
  FROM v1 JOIN h USING (c_custkey) WHERE u >= 0.05
  UNION ALL
  SELECT v1.c_custkey + 10000000, c_acctbal, c_mktsegment
  FROM v1 JOIN h USING (c_custkey) WHERE u >= 0.95),
d AS (
  SELECT coalesce(v1.c_custkey, v2.c_custkey) AS c_custkey,
         CASE WHEN v1.c_custkey IS NULL THEN 'I'
              WHEN v2.c_custkey IS NULL THEN 'D'
              WHEN v1.c_acctbal IS DISTINCT FROM v2.c_acctbal
                   OR v1.c_mktsegment IS DISTINCT FROM v2.c_mktsegment
                THEN 'U'
              ELSE 'N' END AS change_type,
         v1.c_acctbal AS old_c_acctbal, v2.c_acctbal AS new_c_acctbal,
         v1.c_mktsegment AS old_c_mktsegment,
         v2.c_mktsegment AS new_c_mktsegment
  FROM v1 FULL OUTER JOIN v2 ON v1.c_custkey = v2.c_custkey)
SELECT * FROM d WHERE change_type <> 'N' ORDER BY c_custkey
""",
)
def q_customer_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-based CDC: diff two loads of the customer dimension and
    classify every key I/D/U (operators/scd.py::snapshot_diff — ONE
    full-outer shuffle join, null-safe column comparison inside the
    join's project, no second pass).  Snapshot v2 is derived
    deterministically from v1 by content hash: 5% deleted, 10% balance
    bumped, 5% cloned as inserts — both engines rebuild it
    bit-identically, so every old/new value is hash-checked."""
    from ..functions.hashing import uniform_hash
    from ..operators.scd import snapshot_diff

    v1 = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    u = uniform_hash("c_custkey", salt="cdc")
    base = v1.withColumn("__u", u)
    kept = (
        base.filter(F.col("__u") >= 0.05)
        .withColumn(
            "c_acctbal",
            F.when(F.col("__u") < 0.15, F.col("c_acctbal") + 100.0).otherwise(
                F.col("c_acctbal")
            ),
        )
        .drop("__u")
    )
    ins = base.filter(F.col("__u") >= 0.95).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"),
        "c_acctbal",
        "c_mktsegment",
    )
    v2 = kept.unionByName(ins)
    d = snapshot_diff(v1, v2, ["c_custkey"], ["c_acctbal", "c_mktsegment"])
    return d.filter(F.col("change_type") != "N").orderBy("c_custkey")


@register(
    "item_item_cf_neighbors",
    oracle=f"""
WITH baskets AS ({_CAPPED_BASKETS_SQL}),
idf AS (SELECT l_partkey, count(*) AS df FROM baskets GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS c
  FROM baskets a
  JOIN baskets b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
sym AS (
  SELECT pa AS item, pb AS neighbor, c FROM pairs
  UNION ALL
  SELECT pb AS item, pa AS neighbor, c FROM pairs),
scored AS (
  SELECT s.item, s.neighbor, s.c,
         s.c / sqrt(di.df * dj.df) AS cos_raw
  FROM sym s
  JOIN idf di ON s.item = di.l_partkey
  JOIN idf dj ON s.neighbor = dj.l_partkey
  WHERE s.c >= 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY item
                               ORDER BY cos_raw DESC, neighbor) AS rnk
  FROM scored)
SELECT item, neighbor, c AS cooccur,
       (floor(cos_raw * 1000000 + 0.5) / 1000000) AS cosine, rnk
FROM ranked WHERE rnk <= 3
ORDER BY item, rnk
""",
)
def q_item_item_cf_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-based collaborative filtering: top-3 nearest neighbors per
    part by co-occurrence cosine c_ij / sqrt(df_i * df_j) over deduped
    order baskets — the classic neighborhood model the reference's ALS
    complements (precompute once, serve neighbors with no model).

    Scale shape: one distinct on (order, item), one self-join that
    shuffles ONLY on the basket key (pair fan-out bounded by basket
    width squared), broadcast item-frequency table, and a per-item
    rank window (state bounded by one item's candidate list).  The
    cosine is exact-integer inputs -> one sqrt + one division, IEEE-
    identical on both engines, so ranking by the RAW double is
    deterministic; the reported value is det-rounded."""
    from ..operators.topk import top_k_per_group

    li = _t(spark, sf_dir, "lineitem")
    # basket cap before the pair self-join (no-op on uniform data; see
    # _BASKET_CAP) — df too is computed over the capped baskets so both
    # engines score the same graph
    baskets = _capped_baskets(li).localCheckpoint(eager=False)
    idf = baskets.groupBy("l_partkey").agg(F.count("*").alias("df"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count("*").alias("c"))
    )
    sym = pairs.select(
        F.col("pa").alias("item"), F.col("pb").alias("neighbor"), "c"
    ).unionByName(
        pairs.select(F.col("pb").alias("item"), F.col("pa").alias("neighbor"), "c")
    )
    scored = (
        sym.filter(F.col("c") >= 2)
        .join(F.broadcast(idf.withColumnRenamed("l_partkey", "item")), "item")
        .withColumnRenamed("df", "df_i")
        .join(F.broadcast(idf.withColumnRenamed("l_partkey", "neighbor")), "neighbor")
        .withColumnRenamed("df", "df_j")
        .withColumn("cos_raw", F.col("c") / F.sqrt(F.col("df_i") * F.col("df_j")))
    )
    top = top_k_per_group(
        scored,
        ["item"],
        [F.col("cos_raw").desc(), F.col("neighbor").asc()],
        k=3,
        rank_col="rnk",
        keep_rank=True,
    )
    return top.select(
        "item",
        "neighbor",
        F.col("c").alias("cooccur"),
        det_round(F.col("cos_raw")).alias("cosine"),
        "rnk",
    ).orderBy("item", "rnk")


@register(
    "customer_time_travel",
    oracle=f"""
WITH v1 AS (SELECT c_custkey, c_acctbal FROM customer),
h AS (SELECT c_custkey, {_CDC_U} AS u FROM customer),
v2 AS (
  SELECT v1.c_custkey,
         CASE WHEN u < 0.15 THEN c_acctbal + 100.0 ELSE c_acctbal END
           AS c_acctbal
  FROM v1 JOIN h USING (c_custkey) WHERE u >= 0.05
  UNION ALL
  SELECT v1.c_custkey + 10000000, c_acctbal
  FROM v1 JOIN h USING (c_custkey) WHERE u >= 0.95)
SELECT 1 AS version, count(*) AS n_rows,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS acctbal_cents_sum,
       CAST(sum(c_custkey) AS BIGINT) AS id_sum
FROM v1
UNION ALL
SELECT 2, count(*),
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT),
       CAST(sum(c_custkey) AS BIGINT)
FROM v2
ORDER BY version
""",
)
def q_customer_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-versioned table + time travel (sources/versioned.py):
    load v1 of the customer dimension, publish the CDC-mutated second
    load as snapshot v2 (same deterministic derivation as
    customer_snapshot_diff), then query BOTH versions back through
    read_snapshot — per-version row count, exact-cents balance sum and
    id fingerprint.  The numbers come from reading the published
    snapshot files, so the atomic write -> list -> pinned-read path is
    what the oracle gates; the oracle recomputes both loads from the
    base table.  Scratch path is per-invocation (staging_dir) so
    concurrent gate/bench runs never interleave."""
    from ..functions.hashing import uniform_hash
    from ..sources.versioned import read_snapshot, write_snapshot

    path = staging_dir("timetravel", sf_dir)

    v1 = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    u = uniform_hash("c_custkey", salt="cdc")
    base = v1.withColumn("__u", u)
    kept = (
        base.filter(F.col("__u") >= 0.05)
        .withColumn(
            "c_acctbal",
            F.when(F.col("__u") < 0.15, F.col("c_acctbal") + 100.0).otherwise(
                F.col("c_acctbal")
            ),
        )
        .drop("__u")
    )
    ins = base.filter(F.col("__u") >= 0.95).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"), "c_acctbal"
    )
    ver1 = write_snapshot(v1, path)
    ver2 = write_snapshot(kept.unionByName(ins), path)

    def stats(ver: int):
        snap = read_snapshot(spark, path, ver)
        return snap.agg(
            F.lit(ver).alias("version"),
            F.count("*").alias("n_rows"),
            (F.sum(F.col("c_acctbal").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("acctbal_cents_sum"),
            F.sum("c_custkey").cast("long").alias("id_sum"),
        )

    return stats(ver1).unionByName(stats(ver2)).orderBy("version")


@register(
    "customer_hierarchy_depth",
    oracle="""
WITH RECURSIVE climb(v, cur, d) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT v, cur // 8, d + 1 FROM climb WHERE cur >= 8)
SELECT v AS c_custkey, cur AS root, CAST(d AS BIGINT) AS depth
FROM climb WHERE cur < 8
ORDER BY c_custkey
""",
)
def q_customer_hierarchy_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy traversal by pointer doubling (operators/graph.py::
    ancestor_roots): a synthetic management forest over customers
    (parent = custkey DIV 8, keys below 8 are roots) resolved to
    (root, depth) for every node in O(log depth) self-join rounds —
    the distributed answer to the recursive CTE the oracle runs, which
    walks one level per iteration.  At 1000 executors a depth-1e6
    chain is ~20 shuffles, not 1e6; every value is an exact integer."""
    from ..operators.graph import ancestor_roots

    c = _t(spark, sf_dir, "customer").select("c_custkey")
    parents = c.select(
        F.col("c_custkey").alias("v"),
        F.when(F.col("c_custkey") >= 8, F.expr("c_custkey DIV 8")).alias("p"),
    )
    out = ancestor_roots(parents, "v", "p", rounds=4)
    return out.select(
        F.col("v").alias("c_custkey"), "root", F.col("depth").cast("long").alias("depth")
    ).orderBy("c_custkey")


@register(
    "customer_link_prediction_aa",
    oracle="""
WITH purch AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
pdf AS (
  SELECT p, count(*) AS df,
         CAST(floor(1000000.0 / ln(count(*))) AS BIGINT) AS w
  FROM purch GROUP BY p
  HAVING count(*) BETWEEN 2 AND 50),
pairs AS (
  SELECT a.c AS cust_a, b.c AS cust_b,
         count(*) AS common_parts,
         CAST(sum(w) AS BIGINT) AS aa_micro
  FROM purch a
  JOIN purch b ON a.p = b.p AND a.c < b.c
  JOIN pdf ON pdf.p = a.p
  GROUP BY 1, 2)
SELECT cust_a, cust_b, common_parts, aa_micro
FROM pairs
ORDER BY aa_micro DESC, cust_a, cust_b
LIMIT 20
""",
)
def q_customer_link_prediction_aa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the customer-part bipartite graph:
    Adamic-Adar scores sum 1/ln(df_p) over shared parts — rare shared
    purchases count more — surfacing the 20 most-similar customer
    pairs.  The 1/ln weights convert ONCE to integer micro-units
    (floor(1e6/ln df) — ln on identical integers is IEEE-identical, and
    the pair aggregate then sums exact BIGINTs, immune to summation
    order).  Scale shape: pair fan-out is df_p^2 per part, so parts
    join through an explicit df BETWEEN 2 AND 50 gate — hub parts carry
    ~no Adamic-Adar signal and would otherwise dominate the shuffle;
    the cap is the scale dial, stated rather than assumed."""
    from ..operators.topk import top_k_global

    from pyspark import StorageLevel

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # DISK_ONLY, not the default deserialized level: purch is the big
    # reused frame (3 scans: df table + both self-join sides) and
    # pinning its rows on-heap is what starved the pair aggregate's
    # spill under the round-8 4 GiB soak (OOM allocating the spill
    # writer inside HashAggregateExec) — sequential disk re-reads of a
    # compact 2-column frame cost far less than the heap they free
    purch = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    pdf = (
        purch.groupBy("p")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= 50))
        .select(
            F.col("p").alias("wp"),
            F.floor(1000000.0 / F.log(F.col("df").cast("double")))
            .cast("long")
            .alias("w"),
        )
    )
    # Pre-filter BOTH self-join sides with the broadcast df-gate BEFORE
    # the pair fan-out (guide §2.3/§3.2, round-13 verdict task 4): the
    # r13 plan fanned out ALL pairs — hub parts included — through the
    # SortMergeJoin and only then dropped non-gated parts at the
    # BroadcastHashJoin above it.  Every pair row already required
    # pdf.p == a.p, so gating the inputs is semantics-identical (the
    # oracle's JOIN pdf ON pdf.p = a.p precedes its GROUP BY too), but
    # the rows entering the p-keyed exchanges and the quadratic fan-out
    # now exclude every df>50 hub up front — at sf1+ that is most of
    # the purchase table, and the hub fan-out it prevents is df^2 per
    # part.  w rides along on the 'a' side, so the old post-join pdf
    # attach disappears entirely.
    # pf is rebuilt per self-join side (scan of the checkpointed purch +
    # one broadcast-hash probe — cheap and fully pipelined).  A DISK_ONLY
    # checkpoint of pf was tried and REVERTED: on a corpus where the df
    # gate is non-selective (the uniform testdata: df ≈ 30, nearly every
    # part inside [2, 50]) pf ≈ purch and the block write + two cold
    # reads measured ~16% slower at sf1 than recomputing the gate probe
    # twice; on a selective (Zipfian) corpus the fan-out pruning below
    # is the win either way.
    pf = purch.join(F.broadcast(pdf), F.col("p") == F.col("wp")).select("c", "p", "w")
    a, b = pf.alias("a"), pf.alias("b")
    # pack the customer pair into one long for the aggregate (same trick
    # as part_pagerank: 8-byte vs 16-byte hash-map key over the df^2
    # pair fan-out — halves the partial-agg map entry under tight heaps)
    ck = F.col("a.c") * F.lit(4294967296).cast("long") + F.col("b.c")
    raw = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.c") < F.col("b.c")))
        .select(ck.alias("ck"), F.col("a.w").alias("w"))
    )
    # pre-partition the pair stream on the (mostly-unique) pair key at
    # 4x the session's shuffle parallelism before aggregating: the
    # aggregate's per-task hash map shrinks 4x, which is what kept the
    # round-8 4 GiB soak alive — 32 concurrent partial-agg maps over a
    # ~90M-pair fan-out (sf1) exhausted the heap at the moment the map
    # tried to allocate its own spill writer.  At full heap the extra
    # exchange of a compact (long, long) stream costs ~a second.
    n_agg = 4 * int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    pairs = (
        raw.repartition(n_agg, "ck")
        .groupBy("ck")
        .agg(
            F.count("*").alias("common_parts"),
            F.sum("w").cast("long").alias("aa_micro"),
        )
        .select(
            F.expr("ck DIV 4294967296").alias("cust_a"),
            (F.col("ck") % 4294967296).alias("cust_b"),
            "common_parts",
            "aa_micro",
        )
    )
    return top_k_global(
        pairs, [F.col("aa_micro").desc(), F.col("cust_a").asc(), F.col("cust_b").asc()], 20
    )


@register(
    "revenue_mom_growth",
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS rev_cents,
         count(*) AS n_orders
  FROM orders GROUP BY 1),
g AS (
  SELECT month, rev_cents, n_orders,
         lag(rev_cents) OVER (ORDER BY month) AS prev_cents,
         CAST(avg(rev_cents) OVER (ORDER BY month
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS ma3_raw
  FROM m)
SELECT strftime(month, '%Y-%m-%d') AS month, rev_cents, n_orders,
       (floor((CASE WHEN prev_cents IS NOT NULL AND prev_cents <> 0
               THEN (rev_cents - prev_cents) * 100.0 / prev_cents
               ELSE 0.0 END) * 1000000 + 0.5) / 1000000) AS mom_pct_r6,
       CAST(floor(ma3_raw) AS BIGINT) AS ma3_cents_floor
FROM g ORDER BY month
""",
)
def q_revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar analytics: monthly revenue with month-over-month growth
    and a 3-month trailing average — the reporting query every BI layer
    runs.  Monthly sums are exact integer cents (DECIMAL -> BIGINT), so
    lag/growth arithmetic is exact; the 3-month average floors its
    double to whole cents.  The month-level frame is tiny by
    construction (one row per month regardless of order volume), so the
    ordered window is bounded state — the heavy lifting is one
    map-side-combinable monthly aggregate over the fact table."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("rev_cents"),
        F.count("*").alias("n_orders"),
    )
    w = Window.orderBy("month")
    w3 = w.rowsBetween(-2, Window.currentRow)
    g = m.select(
        "month",
        "rev_cents",
        "n_orders",
        F.lag("rev_cents").over(w).alias("prev_cents"),
        F.avg("rev_cents").over(w3).cast("double").alias("ma3_raw"),
    )
    p6 = float(10**6)
    return g.select(
        F.date_format("month", "yyyy-MM-dd").alias("month"),
        "rev_cents",
        "n_orders",
        (
            F.floor(
                F.when(
                    F.col("prev_cents").isNotNull() & (F.col("prev_cents") != 0),
                    (F.col("rev_cents") - F.col("prev_cents"))
                    * 100.0
                    / F.col("prev_cents"),
                ).otherwise(0.0)
                * p6
                + F.lit(0.5)
            )
            / p6
        ).alias("mom_pct_r6"),
        F.floor("ma3_raw").cast("long").alias("ma3_cents_floor"),
    ).orderBy("month")


@register(
    "qty_discount_histogram_2d",
    oracle="""
WITH b AS (
  SELECT CAST((CAST(floor(l_quantity + 0.5) AS BIGINT) - 1) // 5 AS INT)
           AS qty_bin,
         CAST(CAST(floor(l_discount * 100 + 0.5) AS BIGINT) // 2 AS INT)
           AS disc_bin,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem)
SELECT qty_bin, disc_bin, count(*) AS n,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM b GROUP BY 1, 2 ORDER BY qty_bin, disc_bin
""",
)
def q_qty_discount_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (heatmap) of quantity x discount with per-cell
    revenue — the binned-aggregate shape behind every density plot and
    OLAP heatmap.  Bin ids come from integer-exact arithmetic (round to
    whole units / whole discount-percent FIRST, then integer-divide) —
    never floor(double/width), whose 0.06/0.02 = 2.999... misbins
    across engines.  One map-side-combinable aggregate over <= 50
    cells; zero shuffle beyond it."""
    qty_bin = ((F.floor(F.col("l_quantity") + 0.5).cast("long") - 1) / 5).cast("int")
    disc_bin = (F.floor(F.col("l_discount") * 100 + 0.5).cast("long") / 2).cast("int")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.expr("CAST((CAST(floor(l_quantity + 0.5) AS BIGINT) - 1) DIV 5 AS INT)").alias(
                "qty_bin"
            ),
            F.expr("CAST(CAST(floor(l_discount * 100 + 0.5) AS BIGINT) DIV 2 AS INT)").alias(
                "disc_bin"
            ),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .groupBy("qty_bin", "disc_bin")
        .agg(F.count("*").alias("n"), F.sum("cents").cast("long").alias("revenue_cents"))
        .orderBy("qty_bin", "disc_bin")
    )


@register(
    "part_entity_golden_records",
    oracle="""
WITH RECURSIVE
names AS (SELECT DISTINCT p_name FROM part),
b AS (SELECT p_name, string_split(p_name, ' ')[1] AS blk FROM names),
prs AS (
  SELECT a.p_name AS u, c.p_name AS v
  FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
  WHERE levenshtein(a.p_name, c.p_name) <= 3),
edges AS (SELECT u, v FROM prs UNION SELECT v, u FROM prs),
reach(src, dst) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
comp AS (SELECT src AS p_name, least(src, min(dst)) AS ent
         FROM reach GROUP BY src),
m AS (
  SELECT p.p_partkey, p.p_name, p.p_size, p.p_retailprice,
         coalesce(c.ent, p.p_name) AS ent
  FROM part p LEFT JOIN comp c USING (p_name)),
sized AS (
  SELECT ent, count(*) AS n_members, count(DISTINCT p_name) AS n_names
  FROM m GROUP BY ent HAVING count(DISTINCT p_name) >= 2),
nm AS (
  SELECT m.ent, m.p_name, count(*) AS cnt FROM m JOIN sized USING (ent)
  GROUP BY m.ent, m.p_name),
canon AS (
  SELECT ent, p_name AS canonical_name
  FROM (SELECT *, row_number() OVER (PARTITION BY ent
                                     ORDER BY cnt DESC, p_name) AS rk
        FROM nm)
  WHERE rk = 1)
SELECT s.ent AS entity_id, s.n_members, s.n_names, c.canonical_name,
       CAST(min(floor(m.p_retailprice * 100 + 0.5)) AS BIGINT) AS min_price_cents,
       max(m.p_size) AS max_size,
       CAST(sum(m.p_partkey) AS BIGINT) AS member_id_sum
FROM sized s JOIN canon c USING (ent) JOIN m USING (ent)
GROUP BY s.ent, s.n_members, s.n_names, c.canonical_name
ORDER BY entity_id
""",
)
def q_part_entity_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end at the REFERENCE-STRING level:
    blocked Levenshtein matching over DISTINCT part names -> connected
    components over the name graph -> parts mapped to their entity ->
    one GOLDEN RECORD per resolved entity with survivorship rules
    (modal name with deterministic tie-break, min price, max size,
    member-id fingerprint) — the master-data-management pipeline on
    top of the engine's fuzzy matcher and component operators.

    Resolving at the name level is the scale design, not a shortcut:
    the quadratic matcher and the component graph are bounded by the
    DISTINCT-name vocabulary (64 names / 8 blocks at sf0.1), while the
    20k-row part table only ever joins by name — the row count never
    enters the pair fan-out.  (The first cut paired at the row level:
    2.5k-row blocks of near-identical names -> ~50M edges -> the
    closure detonated at sf0.1.)  The oracle recomputes clusters with
    a recursive transitive closure over names; the engine runs
    join-based min-label propagation — two algorithms, one hash."""
    from ..operators.graph import dedup_canonical
    from ..operators.topk import top_k_per_group

    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_size", "p_retailprice"
    )
    names = part.select("p_name").distinct()
    b = names.withColumn("blk", F.split("p_name", " ").getItem(0))
    a, c = b.alias("a"), b.alias("c")
    prs = (
        a.join(
            c,
            (F.col("a.blk") == F.col("c.blk"))
            & (F.col("a.p_name") < F.col("c.p_name")),
        )
        .filter(F.levenshtein(F.col("a.p_name"), F.col("c.p_name")) <= 3)
        .select(F.col("a.p_name").alias("id_a"), F.col("c.p_name").alias("id_b"))
    )
    ents = (
        dedup_canonical(names.withColumnRenamed("p_name", "doc_id"), prs)
        .select(F.col("doc_id").alias("p_name"), F.col("component").alias("ent"))
    )
    m = part.join(ents, "p_name").localCheckpoint(eager=False)
    sized = (
        m.groupBy("ent")
        .agg(
            F.count("*").alias("n_members"),
            F.countDistinct("p_name").alias("n_names"),
        )
        .filter(F.col("n_names") >= 2)
    )
    nm = (
        m.join(sized.select("ent"), "ent")
        .groupBy("ent", "p_name")
        .agg(F.count("*").alias("cnt"))
    )
    canon = top_k_per_group(
        nm, ["ent"], [F.col("cnt").desc(), F.col("p_name").asc()], k=1
    ).select("ent", F.col("p_name").alias("canonical_name"))
    return (
        sized.join(canon, "ent")
        .join(m, "ent")
        .groupBy("ent", "n_members", "n_names", "canonical_name")
        .agg(
            F.min(F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)))
            .cast("long")
            .alias("min_price_cents"),
            F.max("p_size").alias("max_size"),
            F.sum("p_partkey").cast("long").alias("member_id_sum"),
        )
        .select(
            F.col("ent").alias("entity_id"),
            "n_members",
            "n_names",
            "canonical_name",
            "min_price_cents",
            "max_size",
            "member_id_sum",
        )
        .orderBy("entity_id")
    )


@register(
    "customer_scd2_point_in_time",
    oracle="""
WITH dim AS (
  SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal,
         '1995-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
  FROM customer WHERE c_mktsegment <> 'BUILDING'
  UNION ALL
  SELECT c_custkey, c_mktsegment, round(c_acctbal, 2),
         '1995-01-01', '1998-06-01'
  FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION ALL
  SELECT c_custkey, c_mktsegment, round(round(c_acctbal, 2) + 100, 2),
         '1998-06-01', CAST(NULL AS VARCHAR)
  FROM customer WHERE c_mktsegment = 'BUILDING'),
pit AS (
  SELECT * FROM dim
  WHERE valid_from <= '1998-01-15'
    AND (valid_to IS NULL OR valid_to > '1998-01-15')),
j AS (
  SELECT o.o_orderkey, o.o_custkey, a.c_mktsegment, a.acctbal
  FROM orders o JOIN pit a ON a.c_custkey = o.o_custkey
  WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-02-01')
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(acctbal AS DECIMAL(18,2))) * 100 AS BIGINT)
         AS acctbal_cents_sum
FROM j GROUP BY 1 ORDER BY 1
""",
)
def q_customer_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: January orders joined against
    the SCD2 customer dimension AS OF 1998-01-15 (one validity-interval
    filter BEFORE the join — the dimension collapses to one row per key,
    so the join is a plain equi-join, never an interval join).  This is
    the query pattern that makes SCD2 history usable: reproduce any
    past report against the dimension as it stood.  The AS-OF slice
    predicate pushes to the dimension scan; the fact date filter pushes
    to the fact scan."""
    from ..operators.scd import scd2_apply

    cust = _t(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("1995-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    updates = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.round("c_acctbal", 2) + 100, 2).alias("acctbal"),
    )
    scd = scd2_apply(
        dim, updates, key_cols=["c_custkey"],
        attr_cols=["c_mktsegment", "acctbal"], batch_ts="1998-06-01",
    )
    asof = scd.filter(
        (F.col("valid_from") <= "1998-01-15")
        & (F.col("valid_to").isNull() | (F.col("valid_to") > "1998-01-15"))
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1998-01-01") & (F.col("o_orderdate") < "1998-02-01")
    )
    j = orders.join(
        F.broadcast(asof), orders.o_custkey == asof.c_custkey
    )
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(F.col("acctbal").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("acctbal_cents_sum"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "order_price_percentile_ranks",
    oracle="""
WITH c AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders)
SELECT o_orderkey, cents,
       CAST(row_number() OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS rnk,
       (floor((percent_rank() OVER (ORDER BY cents, o_orderkey))
              * 1000000 + 0.5) / 1000000) AS pr_r6
FROM c ORDER BY o_orderkey
""",
)
def q_order_price_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global percentile rank of every order by price — the
    score-normalization step (percent_rank = (rank-1)/(n-1)) computed
    WITHOUT a single-partition window: ranks come from the
    distributed global_rank assembly (range partition + triangular
    offsets) and n rides in as a broadcast one-row count, while the
    oracle runs the textbook percent_rank() OVER (ORDER BY ...) that
    funnels the whole table through one WindowExec task.  Prices rank
    as exact integer cents with the order key as total-order tiebreak,
    so ranks are engine- and partitioning-independent."""
    from ..operators.relational import global_rank, with_scalars

    orders = _t(spark, sf_dir, "orders")
    c = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    r = global_rank(c, ["cents", "o_orderkey"], rank_col="rnk")
    n = r.agg(F.count("*").alias("__n"))
    p6 = float(10**6)
    return (
        with_scalars(r, n)
        .select(
            "o_orderkey",
            "cents",
            F.col("rnk").cast("long").alias("rnk"),
            (
                F.floor(
                    ((F.col("rnk") - 1) / (F.col("__n") - 1)) * p6 + F.lit(0.5)
                )
                / p6
            ).alias("pr_r6"),
        )
        .orderBy("o_orderkey")
    )


# content-hash delta split for the join-IVM query: the most recent ~10%
# of line items play the "day that just landed"
_IVM_U = (
    "(CAST(('0x' || substr(md5(concat_ws(chr(1), 'ivm', "
    "CAST(l_orderkey AS VARCHAR), CAST(l_partkey AS VARCHAR), "
    "CAST(l_linenumber AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0)"
)


@register(
    "incremental_star_join_maintenance",
    oracle=f"""
WITH rev AS (
  SELECT l.l_orderkey, l.l_partkey, l.l_linenumber,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
              AS BIGINT) AS rev_cents,
         n.n_name
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey)
SELECT n_name,
       count(*) AS n_rows,
       CAST(sum(CAST(rev_cents AS DECIMAL(38,2))) AS BIGINT) AS total_cents,
       min(rev_cents) AS vmin, max(rev_cents) AS vmax,
       CAST(sum(CAST(rev_cents AS DECIMAL(38,2))) AS DOUBLE) / count(*) AS mean
FROM rev GROUP BY n_name ORDER BY n_name
""",
)
def q_incremental_star_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a STAR-JOIN aggregate (revenue
    per nation): history and the newly-landed delta are split by
    content hash, the history's partial-aggregate state is computed
    once (in production: persisted), and the delta alone joins the
    dimensions and merges into that state — answering the view with
    O(delta + |state|) work while the oracle recomputes from the FULL
    fact table.  Because the monoid merge law is exact
    (merge(state(A), state(B)) == state(A UNION B), DECIMAL sums), the
    incrementally-maintained answer value-hashes identically to the
    scratch recompute.  Dimensions here are join-static (orders /
    customer / nation) — the precondition for delta-only join IVM; a
    changing dimension would route through the SCD2/CDC operators
    first."""
    from ..functions.hashing import uniform_hash
    from ..operators.incremental import finalize_state, merge_states, rollup_state

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    u = uniform_hash("l_orderkey", "l_partkey", "l_linenumber", salt="ivm")

    def joined(fact):
        return (
            fact.join(orders, fact.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .select(
                "n_name",
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("rev_cents"),
            )
        )

    hist = li.filter(u >= 0.1)
    delta = li.filter(u < 0.1)
    state_hist = rollup_state(joined(hist), ["n_name"], "rev_cents")
    state_delta = rollup_state(joined(delta), ["n_name"], "rev_cents")
    maintained = merge_states([state_hist, state_delta], ["n_name"])
    fin = finalize_state(maintained, ["n_name"])
    # the exact DECIMAL total renders engine-differently through the
    # driver's pandas canon; integer cents carry the same exactness
    return fin.select(
        "n_name",
        "n_rows",
        F.col("total").cast("long").alias("total_cents"),
        "vmin",
        "vmax",
        "mean",
    ).orderBy("n_name")
