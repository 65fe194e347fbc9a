"""Local mirror of the driver's correctness gate: run every catalog
query on Spark and its oracle SQL on DuckDB over the same parquet dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_catalog.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def norm(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def compare_query(spark, con, fn, sql: str | None, sf_dir: str) -> tuple[bool, str]:
    """Run one Spark query vs its DuckDB oracle. Returns (ok, detail)."""
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    if sql is None:
        return True, f"rows-only ({len(srows)} rows)"
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    if sorted(scols) != sorted(dcols):
        return False, f"cols spark={scols} duck={dcols}"
    order = sorted(scols)
    sset = sorted(tuple(norm(r[c]) for c in order) for r in srows)
    didx = [dcols.index(c) for c in order]
    dset = sorted(tuple(norm(r[i]) for i in didx) for r in drows)
    if len(sset) != len(dset):
        return False, f"rowcount spark={len(sset)} duck={len(dset)}"
    if sset != dset:
        bad = next((a, b) for a, b in zip(sset, dset) if a != b)
        return False, f"value mismatch e.g. spark={bad[0]} duck={bad[1]}"
    return True, f"{len(sset)} rows match"


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_catalog.py [sf_dir] [query ...] --json OUT")
            return 2
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from web_crawler_search_engine_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duck_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ok, detail = compare_query(spark, con, fn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"error: {str(e).splitlines()[0][:200]}"
        print(f"{'ok  ' if ok else 'FAIL'} {name}: {detail}", flush=True)
        results[name] = {
            "ok": ok,
            "oracle": "hash" if oracles.get(name) else "rows_only",
            "detail": detail,
        }
        failures += 0 if ok else 1
    print(f"{failures} failures")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
        print(f"wrote {json_out} ({len(results)} rows)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
