"""Driver-mimic: run each __spark_entry__ query vs its DuckDB oracle at a
given sf and report row-count / schema-name / sorted-value-hash matches.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from conflation_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        return format(v, ".10g")
    if v is None:
        return "␀"
    return str(v)


def value_hash(rows, cols):
    lines = sorted(",".join(norm_cell(r[c]) for c in sorted(cols)) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):7d}  (no oracle: rows-only check)")
            continue
        drel = con.sql(oracles[name])
        dcols = drel.columns
        drows = [dict(zip(dcols, row)) for row in drel.fetchall()]
        ok_rows = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        ok_hash = ok_schema and value_hash(srows, scols) == value_hash(drows, dcols)
        status = "OK " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{name:24s} {status} rows {len(srows)}/{len(drows)} "
            f"schema={'=' if ok_schema else f'{sorted(scols)} vs {sorted(dcols)}'} hash={'=' if ok_hash else '!'}"
        )
        if status == "FAIL":
            failures += 1
            if ok_schema and ok_rows:
                sset = {tuple(norm_cell(r[c]) for c in sorted(scols)) for r in srows}
                dset = {tuple(norm_cell(r[c]) for c in sorted(dcols)) for r in drows}
                for x in list(sset - dset)[:3]:
                    print("   spark-only:", x)
                for x in list(dset - sset)[:3]:
                    print("   duck-only :", x)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
