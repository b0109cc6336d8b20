"""Scale-probe bench tier (round-3 verdict task 6): time the heaviest
queries at two adjacent scale factors and report the wall-clock scaling
ratio, flagging anything super-linear in the data growth.

The per-round bench measures one SF; this probe is the cross-SF
derivative — the check that caught nothing at sf0.1 would also catch
nothing at sf1.  /root/testdata tops out at sf0.1, so the probe runs
sf0.01 -> sf0.1 (10x lineitem/orders/documents rows; embeddings grow
4x, 500 -> 2000 vectors — ratios for embedding queries are read against
that smaller growth).

Each query runs ``runs`` times per SF in one JVM and reports the MIN
(steady-state plan cost; the first run pays JIT/codegen — the same
cold-start noise the round-4 budget adjudication measured).  Ratios
well under the data growth are normal at these sizes (fixed per-query
overheads dominate); ratios ABOVE it mean the plan does super-linear
work and needs a plan read before any larger deployment.

Usage:
    python tools/scale_probe.py [N]         # N heaviest (default 12)
    python tools/scale_probe.py name...     # explicit query list
Writes BENCH_SCALE.md at the repo root and prints the same table.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"
DATA_GROWTH = 10.0  # lineitem/orders/documents; embeddings grow 4x
RUNS = 2
# e2e compositions measure their whole pipeline (ALS fits, dedup
# cascade) — their cost story is audited per-stage, not cross-SF
E2E = {"movielens_e2e_cli", "corpus_curation_e2e", "dedup_pipeline_summary"}


def pick_heaviest(n: int) -> list[str]:
    with open(os.path.join(ROOT, "tools", "bench_budget.json")) as fh:
        budget = json.load(fh)["queries"]
    ranked = sorted(budget.items(), key=lambda kv: -kv[1])
    return [name for name, _ in ranked if name not in E2E][:n]


def main(argv: list[str]) -> int:
    if argv and not argv[0].isdigit():
        names = argv
    else:
        names = pick_heaviest(int(argv[0]) if argv else 12)

    from movie_recommendation_engine_spark.registry import QUERIES
    from movie_recommendation_engine_spark.session import get_spark

    spark = get_spark("scale_probe", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in (SF_SMALL, SF_BIG):  # warm parquet footers
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    results: dict[str, dict[str, float]] = {}
    for name in names:
        if name not in QUERIES:
            print(f"# unknown query {name}, skipping", file=sys.stderr)
            continue
        row: dict[str, float] = {}
        for sf_dir in (SF_SMALL, SF_BIG):
            best = float("inf")
            for _ in range(RUNS):
                df = None
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                df.count()
                best = min(best, time.perf_counter() - t0)
                df = None
                gc.collect()
            row[sf_dir] = round(best, 3)
        row["ratio"] = round(row[SF_BIG] / row[SF_SMALL], 2)
        results[name] = row
        print(f"# {name}: {row[SF_SMALL]}s -> {row[SF_BIG]}s "
              f"(x{row['ratio']})", file=sys.stderr)
    spark.stop()

    lines = [
        "# BENCH_SCALE — cross-SF scaling probe",
        "",
        f"Heaviest queries timed at sf0.01 and sf0.1 (min of {RUNS} runs "
        "per SF, one local[32] JVM; `tools/scale_probe.py`).  Data grows "
        "10x between these SFs (embeddings 4x).  `ratio` is wall-clock "
        "sf0.1/sf0.01; `grade` is sub-linear/linear/SUPER-LINEAR vs the "
        "10x data growth (super-linear = ratio > 10).",
        "",
        "| query | sf0.01 (s) | sf0.1 (s) | ratio | grade |",
        "|---|---|---|---|---|",
    ]
    for name, row in sorted(results.items(), key=lambda kv: -kv[1]["ratio"]):
        r = row["ratio"]
        grade = "SUPER-LINEAR" if r > DATA_GROWTH else (
            "linear" if r > 0.7 * DATA_GROWTH else "sub-linear")
        lines.append(
            f"| {name} | {row[SF_SMALL]} | {row[SF_BIG]} | {r} | {grade} |"
        )
    worst = max(results.values(), key=lambda r: r["ratio"])["ratio"] if results else 0
    lines += [
        "",
        f"Worst observed ratio: {worst} (data growth {DATA_GROWTH}).",
        "",
    ]
    out = "\n".join(lines)
    with open(os.path.join(ROOT, "BENCH_SCALE.md"), "w") as fh:
        fh.write(out)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
