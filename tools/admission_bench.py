"""Per-round admission READ cost: r3.8 full-live-scan vs the r3.9
pos_bucket-pruned window, as a function of pending size.

r3.8 removed every per-round WRITE that scales with the frontier;
admission remained the one O(pending) READ — each round scanned the
whole live pending_log to rank per-host candidates, even though only
each host's earliest ``quota`` rows can ever be admitted. r3.9 stores
pending_log hive-partitioned by pos_bucket = min(host_pos // B, CAP)
(B = max politeness quota per round) and tracks per-host consumed
watermarks, so admission reads only buckets 0..rounds-since-
compaction: a deep (Zipf-hot) host contributes O(B · compaction
cadence) rows instead of its whole queue.

For each pending size N this bench builds the SAME live queue state
in both layouts (Zipf host skew via bench.synth_frontier — dense
per-host positions, consumed watermarks mid-compaction-window) and
measures the full admission candidate pipeline (read -> watermark
filter -> politeness rank via operators.scheduler.admit -> admitted
key checksum):

  full_admit_sec     r3.8 shape: scan the flat layout, anti-join the
                     consumed keys (the old removal-record set),
                     rank, checksum.
  window_admit_sec   r3.9 shape: read buckets 0..rsc only, watermark
                     arithmetic filter, rank, checksum.

Both paths must produce the IDENTICAL admitted key checksum — the
bench asserts it (same guarantee the parity suite locks end-to-end).

Run:  python tools/admission_bench.py --sizes 6000000,24000000
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="6000000,24000000")
    ap.add_argument("--hosts", type=int, default=4096)
    ap.add_argument("--bucket-width", type=int, default=64, dest="bw")
    ap.add_argument("--cap", type=int, default=9)
    ap.add_argument("--rsc", type=int, default=4,
                    help="rounds since compaction (window depth)")
    ap.add_argument("--quota", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bench import synth_frontier
    from web_crawler_search_engine_spark.operators.scheduler import admit
    from web_crawler_search_engine_spark.sources.checkpoints import (
        KEY_BLOOM_OPTIONS,
    )

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("admission-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def best(fn):
        times = []
        for _ in range(args.reps):
            t = time.monotonic()
            fn()
            times.append(time.monotonic() - t)
        return round(min(times), 3), [round(t, 3) for t in times]

    out_rows = []
    for n in (int(s) for s in args.sizes.split(",")):
        work = Path(tempfile.mkdtemp(prefix="admbench_"))
        rows = synth_frontier(spark, n, args.hosts, "adm")
        # synth_frontier's Zipf host assignment is monotone in
        # discovery_seq, so each host's rows are a contiguous seq
        # range: host_pos = seq - min(seq) per host is dense, exactly
        # the engine's arrival-index invariant.
        host_min = rows.groupBy("host").agg(
            F.min("discovery_seq").alias("_min_seq"),
            F.count("*").alias("_depth"),
        )
        full = (
            rows.join(F.broadcast(host_min), "host")
            .withColumn(
                "host_pos", (F.col("discovery_seq") - F.col("_min_seq"))
            )
            .drop("_min_seq")
        )
        # mid-window state: every host has consumed rsc rounds' worth
        # of quota (capped by its depth), like round rsc+1 after a
        # compaction rebase
        consumed = F.least(
            F.lit(args.rsc * args.quota).cast("long"), F.col("_depth")
        )
        full = full.withColumn("_consumed", consumed).drop("_depth")

        flat_path = work / "flat"
        part_path = work / "part"
        w = full.repartition(32, "host").write.mode("overwrite")
        for k, v in KEY_BLOOM_OPTIONS.items():
            w = w.option(k, v)
        w.parquet(str(flat_path))
        pw = (
            full.withColumn(
                "pos_bucket",
                F.least(
                    F.floor(F.col("host_pos") / F.lit(args.bw)),
                    F.lit(args.cap),
                ).cast("int"),
            )
            .repartition(32, "host")
            .write.mode("overwrite")
            .partitionBy("pos_bucket")
        )
        for k, v in KEY_BLOOM_OPTIONS.items():
            pw = pw.option(k, v)
        pw.parquet(str(part_path))
        # the r3.8 removal-record set: the consumed rows' keys (what
        # the old layout anti-joined every round)
        removed_path = work / "removed"
        (
            full.filter(F.col("host_pos") < F.col("_consumed"))
            .select("url_key")
            .write.mode("overwrite")
            .parquet(str(removed_path))
        )
        hm_path = work / "host_meta"
        (
            full.groupBy("host")
            .agg(F.max("_consumed").alias("consumed"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(hm_path))
        )

        def rank_and_checksum(cands):
            admitted = admit(
                cands.withColumn("quota", F.lit(args.quota)),
                max_quota=args.quota,
                salt_buckets=16,
                key_col="url_key",
            )
            row = admitted.agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(url_key)").alias("chk"),
            ).collect()[0]
            return int(row["n"]), int(row["chk"] or 0)

        result = {}

        def full_admit():
            cands = (
                spark.read.parquet(str(flat_path))
                .join(
                    spark.read.parquet(str(removed_path)),
                    "url_key",
                    "left_anti",
                )
                .select("url_key", "url", "host", "discovery_seq")
            )
            result["full"] = rank_and_checksum(cands)

        def window_admit():
            subs = [
                str(p)
                for p in part_path.glob("pos_bucket=*")
                if int(p.name.split("=")[1]) <= args.rsc
            ]
            hm = spark.read.parquet(str(hm_path))
            cands = (
                spark.read.parquet(*subs)
                .join(hm, "host", "left")
                .filter(
                    F.col("host_pos")
                    >= F.coalesce(F.col("consumed"), F.lit(0))
                )
                .select("url_key", "url", "host", "discovery_seq")
            )
            result["window"] = rank_and_checksum(cands)

        full_s, full_all = best(full_admit)
        win_s, win_all = best(window_admit)
        assert result["full"] == result["window"], (
            f"admitted sets diverge: {result}"
        )

        subs = [
            str(p)
            for p in part_path.glob("pos_bucket=*")
            if int(p.name.split("=")[1]) <= args.rsc
        ]
        window_rows = spark.read.parquet(*subs).count()
        row = {
            "pending": n,
            "hosts": args.hosts,
            "bucket_width": args.bw,
            "rsc": args.rsc,
            "quota": args.quota,
            "window_rows": window_rows,
            "window_frac": round(window_rows / n, 4),
            "full_admit_sec": full_s,
            "window_admit_sec": win_s,
            "speedup": round(full_s / max(win_s, 1e-9), 1),
            "admitted": result["window"][0],
            "reps": {"full": full_all, "window": win_all},
        }
        out_rows.append(row)
        print(json.dumps(row), file=sys.stderr)
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"cpus": args.cpus, "rows": out_rows}))


if __name__ == "__main__":
    main()
