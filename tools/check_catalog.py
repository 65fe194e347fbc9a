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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from web_crawler_search_engine_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={scols} duck={dcols}")
            failures += 1
            continue
        order = sorted(scols)
        sset = sorted(
            tuple(norm(r[c]) for c in order) for r in srows
        )
        didx = [dcols.index(c) for c in order]
        dset = sorted(tuple(norm(r[i]) for i in didx) for r in drows)
        if len(sset) != len(dset):
            print(f"FAIL {name}: rowcount spark={len(sset)} duck={len(dset)}")
            failures += 1
        elif sset != dset:
            bad = next(
                (a, b) for a, b in zip(sset, dset) if a != b
            )
            print(f"FAIL {name}: value mismatch e.g. spark={bad[0]} duck={bad[1]}")
            failures += 1
        else:
            print(f"ok   {name}: {len(sset)} rows match")
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
