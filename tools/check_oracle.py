"""Driver-mimic: run every queries() entry on Spark and its oracle_sql()
on DuckDB at sf0.01, compare row count, column names, and an
order-insensitive value hash.  This is the local feedback loop for the
driver's CORRECTNESS gate.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".") or "0"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as e
    from movie_recommendation_engine_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    names = sys.argv[1:] or list(qs)
    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.execute(oracles[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            continue
        ok_n = len(srows) == len(drows)
        ok_c = sorted(scols) == sorted(dcols)
        ok_h = ok_n and ok_c and table_hash(srows, scols) == table_hash(drows, dcols)
        status = "OK   " if (ok_n and ok_c and ok_h) else "FAIL "
        if status.startswith("FAIL"):
            failures += 1
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} "
            f"cols={'ok' if ok_c else (scols, dcols)} hash={'ok' if ok_h else 'MISMATCH'}"
        )
        if not ok_h and ok_n and ok_c:
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = sorted("|".join(norm_cell(r[i]) for i in order) for r in srows)
            dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
            dset = sorted("|".join(norm_cell(r[i]) for i in dorder) for r in drows)
            for a, b in zip(sset, dset):
                if a != b:
                    print(f"   spark: {a}\n   duck : {b}")
                    break
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'} ({len(names)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
