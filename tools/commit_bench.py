"""Per-round checkpoint commit cost: O(pending) snapshot vs the
r3.8 O(delta) pending_log append, as a function of pending size.

The r3.7 profile showed that at an 8k-page world the round commit is
job-fixed-cost, so the pending-log layout is wall-NEUTRAL there.
This bench measures the axis the layout actually changes — the DATA
volume the commit writes as pending grows. For each pending size N:

  snapshot_write_sec  what the pre-r3.8 engine paid EVERY round: the
                      full N-row frontier-schema table, repartitioned
                      by host (its old file layout), written to
                      parquet with the url_key bloom options.
  append_write_sec    what the r3.8 engine pays every round: the
                      round's O(delta) evaluated-survivor rows.
  view_read_sec       the r3.8 READ-side tax paid per round: compose
                      base + K deltas, anti-join the removal keys
                      (K rounds' exits), count — vs
  snapshot_read_sec   the old layout's plain snapshot count.

Run:  python tools/commit_bench.py --sizes 600000,6000000,24000000
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
    ap.add_argument("--sizes", default="600000,6000000,24000000")
    ap.add_argument("--delta", type=int, default=20000)
    ap.add_argument("--window", type=int, default=8, help="deltas since compaction")
    ap.add_argument("--hosts", type=int, default=4096)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from bench import synth_frontier
    from web_crawler_search_engine_spark.sources.checkpoints import (
        KEY_BLOOM_OPTIONS,
    )

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("commit-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def frontier_cols(df):
        return df.select(
            "url_key",
            "url",
            "host",
            "depth",
            "discovery_seq",
            "status",
            F.lit(0).cast("long").alias("length"),
            F.lit(1).alias("round"),
            F.lit(True).alias("allowed"),
        )

    def write(df, path, repart=None):
        w = df
        if repart is not None:
            w = df.repartition(repart, "host")
        writer = w.write.mode("overwrite")
        for k, v in KEY_BLOOM_OPTIONS.items():
            writer = writer.option(k, v)
        writer.parquet(str(path))

    out_rows = []
    for n in (int(s) for s in args.sizes.split(",")):
        work = Path(tempfile.mkdtemp(prefix="commitbench_"))
        pending = frontier_cols(synth_frontier(spark, n, args.hosts, "pend"))
        delta = frontier_cols(
            synth_frontier(spark, args.delta, args.hosts, "delt")
        )
        # removal window: K rounds' exits, each ~delta keys
        removed = (
            synth_frontier(
                spark, args.delta * args.window, args.hosts, "pend"
            )
            .filter(F.col("discovery_seq") < args.delta * args.window)
            .select("url_key")
        )

        # materialize the base once (the compaction-time write, shared
        # by both layouts' read benches)
        base_path = work / "base"
        write(pending, base_path, repart=32)
        delta_paths = []
        for i in range(args.window):
            p = work / f"d{i + 1}"
            write(delta, p)
            delta_paths.append(str(p))
        removed_path = work / "removed"
        removed.write.mode("overwrite").parquet(str(removed_path))

        def best(fn):
            times = []
            for _ in range(args.reps):
                t = time.monotonic()
                fn()
                times.append(time.monotonic() - t)
            return round(min(times), 3), [round(t, 3) for t in times]

        snap_w, snap_w_all = best(
            lambda: write(pending, work / "snap", repart=32)
        )
        app_w, app_w_all = best(lambda: write(delta, work / "append"))

        snap_r, snap_r_all = best(
            lambda: spark.read.parquet(str(base_path)).count()
        )

        def view_read():
            plog = spark.read.parquet(str(base_path), *delta_paths)
            rem = spark.read.parquet(str(removed_path))
            (
                plog.join(rem, "url_key", "left_anti").count()
            )

        view_r, view_r_all = best(view_read)

        row = {
            "pending": n,
            "delta": args.delta,
            "window": args.window,
            "snapshot_write_sec": snap_w,
            "append_write_sec": app_w,
            "write_speedup": round(snap_w / max(app_w, 1e-9), 1),
            "snapshot_read_sec": snap_r,
            "view_read_sec": view_r,
            "read_tax_sec": round(view_r - snap_r, 3),
            "reps": {
                "snapshot_write": snap_w_all,
                "append_write": app_w_all,
                "snapshot_read": snap_r_all,
                "view_read": view_r_all,
            },
        }
        out_rows.append(row)
        print(json.dumps(row), file=sys.stderr)
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"cpus": args.cpus, "rows": out_rows}))


if __name__ == "__main__":
    main()
