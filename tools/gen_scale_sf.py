"""Generate a larger scale factor for the cross-SF probe by K-fold
key-shifted replication of an existing testdata SF (round-5 verdict
task 3: the 100-TB design claims rested on a single 10x observation —
this adds the sf0.1 -> sf1 decade).

/root/testdata is read-only and tops out at sf0.1, so the derived SF
lands under the repo (default ``.scale/sf1`` — gitignored: it is a
deterministic artifact of this script + the read-only source, never a
committed input).

Replication model (replica 0 == the source, so every distribution is
preserved exactly and grows linearly):

- ``region``/``nation``: fixed dims, copied once (they are fixed-size
  in TPC-H at every SF).
- fact/dim tables: K replicas with ALL keys shifted by
  ``replica * (max_key + 1)`` CONSISTENTLY across tables — lineitem's
  shifted l_orderkey/l_partkey/l_suppkey still join orders/part/
  supplier, orders' shifted o_custkey still joins customer, so join
  fan-outs and selectivities match the source exactly.
- ``events``: event_id/user_id shifted; ts left unchanged (event
  density per time window grows Kx — the realistic shape for a busier
  system, and the harder one for windowed aggregations).
- ``documents``: doc_id shifted and the TEXT alphabet-rotated per
  replica (a per-replica Caesar bijection over a-z/A-Z).  A bijection
  preserves lengths, token structure, and the INTRA-replica duplicate/
  near-dup structure, while making replicas mutually dissimilar — naive
  text replication would hand MinHash/LSH a K-clique of exact
  duplicates per document, inflating candidate pairs ~K^2/2 and making
  every dedup query read super-linear for a DATA reason, not a PLAN
  reason.  Vocabulary grows Kx, which also scales the broadcast-vocab
  text queries realistically.  ``lang``/``source``/``n_chars`` are
  preserved (rotation is length-preserving).
- ``embeddings``: vec_id shifted, vectors/labels unchanged (candidate
  sets grow Kx; ANN query sides are structurally LIMIT-capped, so this
  probes exactly the scan/score leg that grows).

Deterministic: no randomness anywhere — same source + K -> identical
bytes modulo parquet row-group encoding.

K is bounded at 26: the per-replica Caesar rotation has only 25
non-identity shifts over a 26-letter alphabet (shift 26 IS the
identity, and shift i+26 collides with shift i), so k > 26 would
silently reintroduce the cross-replica exact-duplicate cliques the
rotation exists to prevent.  ``main`` rejects k outside [1, 26].

Usage:
    python tools/gen_scale_sf.py [--src /root/testdata/sf0.1] \
        [--out .scale/sf1] [--k 10]
"""

from __future__ import annotations

import argparse
import os
import string
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# (table, [key columns to shift by this table's own stride]) — strides
# are derived from the SOURCE's max key per entity so cross-table
# references stay aligned
ENTITY_KEYS = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
# table -> {column: entity whose stride shifts it}
SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_ONLY = ["region", "nation"]


def main(argv: list[str] | None = None, stop_spark: bool = False) -> int:
    """``stop_spark`` only from the CLI entry: get_spark getOrCreates,
    so stopping unconditionally would kill a caller's live session
    (the pytest fixture drives this as a library)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(ROOT, ".scale", "sf1"))
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args(argv)
    if not 1 <= args.k <= 26:
        ap.error(
            f"--k must be in [1, 26], got {args.k}: the Caesar rotation has "
            "only 25 non-identity shifts, so replicas 26+ would duplicate "
            "earlier replicas' text verbatim and inflate dedup candidates"
        )

    from pyspark.sql import functions as F

    from movie_recommendation_engine_spark.session import get_spark

    spark = get_spark("gen_scale_sf", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    # strides: max key + 1 per entity, from the source
    strides: dict[str, int] = {}
    for table, key in ENTITY_KEYS.items():
        df = spark.read.parquet(f"{args.src}/{table}.parquet")
        strides[table] = int(df.agg(F.max(key)).collect()[0][0]) + 1
    strides["events_user"] = (
        int(
            spark.read.parquet(f"{args.src}/events.parquet")
            .agg(F.max("user_id"))
            .collect()[0][0]
        )
        + 1
    )

    for table in COPY_ONLY:
        df = spark.read.parquet(f"{args.src}/{table}.parquet")
        df.write.mode("overwrite").parquet(f"{args.out}/{table}.parquet")
        print(f"# {table}: copied {df.count()} rows", file=sys.stderr)

    lower, upper = string.ascii_lowercase, string.ascii_uppercase
    for table, shift_map in SHIFTS.items():
        src = spark.read.parquet(f"{args.src}/{table}.parquet")
        reps = []
        for i in range(args.k):
            rep = src
            for col, entity in shift_map.items():
                t = rep.schema[col].dataType.simpleString()
                rep = rep.withColumn(
                    col, (F.col(col) + F.lit(i * strides[entity])).cast(t)
                )
            if table == "documents" and i > 0:
                rot_l = lower[i:] + lower[:i]
                rot_u = upper[i:] + upper[:i]
                rep = rep.withColumn(
                    "text", F.translate("text", lower + upper, rot_l + rot_u)
                )
            reps.append(rep)
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        # partition count scales with the replication so downstream scans
        # see sf-proportional parallelism, mirroring the source layout
        n_src = src.rdd.getNumPartitions()
        out.repartition(n_src * args.k).write.mode("overwrite").parquet(
            f"{args.out}/{table}.parquet"
        )
        print(f"# {table}: {src.count()} -> {args.k}x replicated", file=sys.stderr)

    if stop_spark:
        spark.stop()
    print(f"# wrote sf (k={args.k}) to {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(stop_spark=True))
