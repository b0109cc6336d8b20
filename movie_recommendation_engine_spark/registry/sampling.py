"""Sampling / split queries (SURVEY §2.8 R1-R2, §7.2 M1) — the engine's
content-hash sampling is bit-reproducible in DuckDB SQL, so even the
*samplers* are oracle-checked, something Spark's built-in rand-based
sampleBy cannot offer.

lineitem plays ratings: l_orderkey≅userId, (l_orderkey, l_partkey,
l_linenumber) is the unique row key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.sampling import per_group_fraction, split_assign, stratified_sample
from . import _t, duck_hash_sql, register

_KEYS = ["l_orderkey", "l_partkey", "l_linenumber"]
_H_SPLIT = duck_hash_sql("split", *_KEYS)
_H_FRAC = duck_hash_sql("", *_KEYS)
_H_STRAT = duck_hash_sql("strat", *_KEYS)


@register(
    "split_label_rows",
    oracle=f"""
SELECT l_orderkey, l_partkey, l_linenumber, split
FROM (
  SELECT l_orderkey, l_partkey, l_linenumber,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY {_H_SPLIT}, l_orderkey, l_partkey, l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_orderkey) AS n,
         CASE WHEN row_number() OVER (PARTITION BY l_orderkey
                  ORDER BY {_H_SPLIT}, l_orderkey, l_partkey, l_linenumber)
                  <= ceil(count(*) OVER (PARTITION BY l_orderkey) * 0.25) THEN 'validation'
              WHEN row_number() OVER (PARTITION BY l_orderkey
                  ORDER BY {_H_SPLIT}, l_orderkey, l_partkey, l_linenumber)
                  <= ceil(count(*) OVER (PARTITION BY l_orderkey) * 0.50) THEN 'test'
              ELSE 'train' END AS split
  FROM lineitem)
ORDER BY l_orderkey, l_partkey, l_linenumber
""",
)
def q_split_label_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every row labeled train/validation/test — one window pass, no
    sample+anti-join rounds (reference E3 distributed)."""
    li = _t(spark, sf_dir, "lineitem")
    labeled = split_assign(li, group_col="l_orderkey", key_cols=_KEYS)
    return labeled.select(*_KEYS, "split").orderBy(*_KEYS)


@register(
    "split_counts",
    oracle=f"""
SELECT split, count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_groups
FROM (
  SELECT l_orderkey,
         CASE WHEN row_number() OVER (PARTITION BY l_orderkey
                  ORDER BY {_H_SPLIT}, l_orderkey, l_partkey, l_linenumber)
                  <= ceil(count(*) OVER (PARTITION BY l_orderkey) * 0.25) THEN 'validation'
              WHEN row_number() OVER (PARTITION BY l_orderkey
                  ORDER BY {_H_SPLIT}, l_orderkey, l_partkey, l_linenumber)
                  <= ceil(count(*) OVER (PARTITION BY l_orderkey) * 0.50) THEN 'test'
              ELSE 'train' END AS split
  FROM lineitem)
GROUP BY split ORDER BY split
""",
)
def q_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    labeled = split_assign(li, group_col="l_orderkey", key_cols=_KEYS)
    return (
        labeled.groupBy("split")
        .agg(F.count("*").alias("n_rows"), F.countDistinct("l_orderkey").alias("n_groups"))
        .orderBy("split")
    )


@register(
    "per_group_sample25",
    oracle=f"""
SELECT l_orderkey, l_partkey, l_linenumber
FROM (
  SELECT l_orderkey, l_partkey, l_linenumber,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY {_H_FRAC}, l_orderkey, l_partkey, l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_orderkey) AS n
  FROM lineitem)
WHERE rn <= ceil(n * 0.25)
ORDER BY l_orderkey, l_partkey, l_linenumber
""",
)
def q_per_group_sample25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 25% of every order's lines (reference pandas
    groupby().sample(frac=.25) distributed, R2)."""
    li = _t(spark, sf_dir, "lineitem")
    out = per_group_fraction(li, "l_orderkey", 0.25, _KEYS)
    return out.select(*_KEYS).orderBy(*_KEYS)


@register(
    "stratified_sample_returnflag",
    oracle=f"""
SELECT l_orderkey, l_partkey, l_linenumber, l_returnflag
FROM lineitem
WHERE {_H_STRAT} < CASE l_returnflag WHEN 'R' THEN 0.1
                                     WHEN 'A' THEN 0.5
                                     ELSE 0.0 END
ORDER BY l_orderkey, l_partkey, l_linenumber
""",
)
def q_stratified_sample_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sampleBy (R1, reference split_script.py:43)."""
    li = _t(spark, sf_dir, "lineitem")
    out = stratified_sample(li, "l_returnflag", {"R": 0.1, "A": 0.5}, _KEYS)
    return out.select(*_KEYS, "l_returnflag").orderBy(*_KEYS)


_H_BAL = duck_hash_sql("bal", "doc_id")


@register(
    "balanced_docs_by_lang",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY {_H_BAL}, doc_id) AS rn
  FROM documents),
k AS (SELECT min(n) AS k FROM (SELECT count(*) AS n FROM documents GROUP BY lang))
SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum,
       min(doc_id) AS id_min, max(doc_id) AS id_max
FROM ranked, k
WHERE rn <= k
GROUP BY lang
ORDER BY lang
""",
)
def q_balanced_docs_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class rebalancing: every language downsampled to the minority
    class size by content-hash rank — exact, deterministic, and
    partition-independent; the id_sum/min/max fingerprint pins WHICH
    rows survived, not just how many."""
    from ..operators.sampling import balance_classes

    docs = _t(spark, sf_dir, "documents")
    picked = balance_classes(docs, "lang", ["doc_id"])
    return (
        picked.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("doc_id").alias("id_sum"),
            F.min("doc_id").alias("id_min"),
            F.max("doc_id").alias("id_max"),
        )
        .orderBy("lang")
    )


_H_MIX = duck_hash_sql("mix", "doc_id")
_MIX_WEIGHTS = {"en": 4, "zh": 2, "es": 1, "fr": 1, "de": 1}
_MIX_W_SQL = ", ".join(f"('{k}', {w})" for k, w in sorted(_MIX_WEIGHTS.items()))


@register(
    "doc_mixture_sample",
    oracle=f"""
WITH wts AS (SELECT * FROM (VALUES {_MIX_W_SQL}) w(lang, w)),
m AS (SELECT min(n // w) AS m FROM (
        SELECT lang, count(*) AS n FROM documents GROUP BY 1) n JOIN wts USING (lang)),
ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY {_H_MIX}, doc_id) AS rn
  FROM documents WHERE lang IN (SELECT lang FROM wts))
SELECT r.lang, count(*) AS n_kept, CAST(sum(r.doc_id) AS BIGINT) AS id_sum,
       min(r.doc_id) AS id_min, max(r.doc_id) AS id_max
FROM ranked r JOIN wts USING (lang), m
WHERE rn <= w * m
GROUP BY r.lang
ORDER BY r.lang
""",
)
def q_doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture corpus sampling (en:zh:es:fr:de = 4:2:1:1:1) —
    the data-mixing pass of LLM pipelines, exact by construction:
    integer weights allocate k_c = w_c * min_c(n_c DIV w_c) rows per
    class, and within a class the lowest-content-hash rows survive, so
    selection is reproducible on any partitioning.  The id fingerprint
    pins WHICH rows were kept."""
    from ..operators.sampling import mixture_sample

    docs = _t(spark, sf_dir, "documents")
    picked = mixture_sample(docs, "lang", ["doc_id"], _MIX_WEIGHTS)
    return (
        picked.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.min("doc_id").alias("id_min"),
            F.max("doc_id").alias("id_max"),
        )
        .orderBy("lang")
    )


@register(
    "kfold_assignment",
    oracle="""
WITH f AS (
  SELECT l_orderkey, l_partkey, l_linenumber,
         CAST(CAST(('0x' || substr(md5(concat_ws(chr(1), 'kfold',
              CAST(l_orderkey AS VARCHAR), CAST(l_partkey AS VARCHAR),
              CAST(l_linenumber AS VARCHAR))), 1, 8)) AS BIGINT) % 5 AS INT)
           AS fold
  FROM lineitem)
SELECT fold, count(*) AS n,
       CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
       (SELECT count(*) FROM f) AS n_total,
       true AS folds_cover_all,
       true AS balance_ok
FROM f GROUP BY fold ORDER BY fold
""",
)
def q_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment (k=5) by
    content hash (functions.hashing.hash_bucket) — reproducible on any
    cluster size or partitioning, the property MLlib's rand()-based
    splits lack.  Gated: per-fold counts and key fingerprints are
    value-checked, coverage (folds partition the table exactly) and
    balance (every fold within 5% of n/k) are pinned as booleans the
    oracle sets true — a broken hash or a lost row flips the hash."""
    from pyspark.sql import Window

    from ..functions.hashing import hash_bucket
    from ..operators.relational import with_scalars

    li = _t(spark, sf_dir, "lineitem")
    f = li.select(
        "l_orderkey",
        hash_bucket(5, "l_orderkey", "l_partkey", "l_linenumber", salt="kfold").alias(
            "fold"
        ),
    )
    tot = f.agg(F.count("*").alias("n_total"))
    g = (
        f.groupBy("fold")
        .agg(F.count("*").alias("n"), F.sum("l_orderkey").cast("long").alias("key_sum"))
    )
    return (
        with_scalars(g, tot)
        .select(
            "fold",
            "n",
            "key_sum",
            "n_total",
            # coverage: the sum of per-fold counts (a window over the
            # k-row fold table — bounded by k, not data) equals the
            # table count; the oracle pins the boolean true
            (F.sum("n").over(Window.partitionBy()) == F.col("n_total")).alias(
                "folds_cover_all"
            ),
            (
                F.abs(F.col("n") - F.col("n_total") / 5)
                <= F.col("n_total") * 0.05
            ).alias("balance_ok"),
        )
        .orderBy("fold")
    )
