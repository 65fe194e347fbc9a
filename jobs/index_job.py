"""spark-submit entry point for the inverted-index build.

Reference CLI analog: ``python start_indexer.py [-n N] [--restart]``
(inverted_indexer/start_indexer.py) — ``-n`` maps to Spark
parallelism, ``--restart`` inverts to our ``--fresh`` (the default is
the reference's restart-able behavior: resume from the parsed_docs
ledger and only parse new pages, S8).

    spark-submit --master <cluster> --py-files dist/engine.zip \
        jobs/index_job.py \
        --pages /path/to/crawl_ckpt        # a CrawlJob checkpoint dir
        --out /path/to/index \
        [--warc-dir /path/to/segments]     # *.warc archive input instead
        [--ledger /path/to/index_ledger]   # enables incremental resume
        [--fresh] [--dedup-shards W]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description="PySpark inverted-index build")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument(
        "--pages",
        help="CrawlJob checkpoint dir (reads its committed pages log)",
    )
    src.add_argument(
        "--warc-dir",
        help="directory of *.warc crawl-archive segments (sources/warc.py)",
    )
    ap.add_argument("--out", required=True, help="index output dir")
    ap.add_argument(
        "--ledger",
        default=None,
        help="parsed_docs ledger dir for incremental resume (S8)",
    )
    ap.add_argument("--fresh", action="store_true", help="ignore the ledger")
    ap.add_argument(
        "--dedup-shards",
        type=int,
        default=None,
        help="X2 per-worker-parity dedup shards (default: global, stronger)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("index-build")
    if args.master:
        b = b.master(args.master)
    spark = b.getOrCreate()

    from web_crawler_search_engine_spark.plans.indexer import (
        build_index,
        build_index_incremental,
        write_index,
    )
    from web_crawler_search_engine_spark.sources.checkpoints import SnapshotStore

    if args.warc_dir:
        from web_crawler_search_engine_spark.sources.warc import (
            pages_from_warc,
        )

        pages = pages_from_warc(spark, args.warc_dir).select("url", "content")
    else:
        pages = (
            SnapshotStore(spark, args.pages)
            .load_log("pages")
            .select("url", "content")
        )
    if args.ledger and not args.fresh:
        store = SnapshotStore(spark, args.ledger)
        nxt = (store.latest_round() or 0) + 1
        docs, postings, n = build_index_incremental(
            pages, store, round_id=nxt, dedup_shards=args.dedup_shards
        )
    else:
        if args.ledger and args.fresh:
            shutil.rmtree(args.ledger, ignore_errors=True)
        docs, postings, n = build_index(pages, dedup_shards=args.dedup_shards)
    write_index(docs, postings, args.out)
    print(json.dumps({"docs": n, "out": args.out}))


if __name__ == "__main__":
    main()
