"""Query latency over the written token-bucketed index: pruned vs
full-scan, at two index sizes.

The reference's headline feature is few-ms search over a prebuilt
55k-page index via its index-of-index seek (README.md:23). The
engine's equivalent property (S12/S13) is DIRECTORY-level partition
pruning over the ``token_bucket=N/`` layout: a query reads only its
tokens' bucket directories, so query I/O scales with the touched
FRACTION of the index, not its total size. The plan shape is locked
by tests/e2e; this tool measures the latency consequence and how it
scales with corpus size:

    python tools/search_scale_bench.py --sizes 6000 60000 --cpus 8

For each size: synthesize a world (sources/corpus.py), build + write
the index once, then min-of-R the same queries over (a) the written
index WITH bucket pruning and (b) the same files scanned in full.
Prints one JSON line with per-size build stats and latencies."""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

QUERIES = ["granite harbor", "lantern", "apple bridge circuit dawn"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[6000, 60000])
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from web_crawler_search_engine_spark.plans import search as S
    from web_crawler_search_engine_spark.plans.indexer import (
        build_index,
        read_index,
        write_index,
    )
    from web_crawler_search_engine_spark.sources.corpus import (
        corpus_df,
        generate_world,
    )

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("search-scale-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "metric": "search_scale_sec",
        "cpus": args.cpus,
        "buckets": args.buckets,
        "queries": QUERIES,
        "sizes": {},
    }
    for n in args.sizes:
        world = generate_world(n=n, hosts=max(20, n // 300), seed=7, with_images=False)
        pages = corpus_df(spark, world).filter(
            F.col("content").isNotNull()
        ).select("url", "content")
        t0 = time.monotonic()
        docs, postings, n_docs = build_index(pages)
        path = tempfile.mkdtemp(prefix=f"searchidx_{n}_")
        write_index(docs, postings, path, buckets=args.buckets)
        build_s = round(time.monotonic() - t0, 2)
        idx_bytes = sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        postings_w, docs_w, buckets = read_index(spark, path)

        def run(df, use_buckets):
            best = {}
            for q in QUERIES:
                toks = S.query_tokens(q)
                for _ in range(args.reps):
                    t = time.monotonic()
                    S.topk(
                        df, toks, k=5,
                        buckets=buckets if use_buckets else None,
                    ).collect()
                    dt = time.monotonic() - t
                    best[q] = min(best.get(q, dt), dt)
            return {q: round(v, 3) for q, v in best.items()}

        pruned = run(postings_w, True)
        full = run(postings_w, False)
        out["sizes"][str(n)] = {
            "n_docs": n_docs,
            "postings_rows": postings.count(),
            "index_mb": round(idx_bytes / 1e6, 1),
            "build_write_sec": build_s,
            "pruned_query_sec": pruned,
            "full_scan_query_sec": full,
            "pruned_min": min(pruned.values()),
            "pruned_max": max(pruned.values()),
        }
        print(f"[search-scale] n={n}: pruned {pruned} full {full}",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
