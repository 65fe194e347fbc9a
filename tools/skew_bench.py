"""Admission under host skew: the salted two-phase top-K must be
skew-INVARIANT, measured.

north_rule: "partitioning / shuffle / skew handled explicitly". The
engine's claim (operators/scheduler.py admit) is that a hot host
never concentrates its pending set in one window task — phase one
ranks within (host, salt) so even a single host holding most of the
frontier spreads over salt_buckets tasks, and phase two ranks only
the ≤ salt_buckets × quota survivors per host. If that design is
real, admission time is flat across host distributions at fixed n;
if it weren't, the pathological distribution would serialize on one
task.

Three distributions over the same n rows, same fixed 64-partition
layout, same quota (8/host):

  uniform  — every host equal share        (max-host share ≈ 1/H)
  zipf     — the engine bench's Zipf(1)    (hottest ≈ 1/ln(H+1) ... )
  point90  — 90% of ALL rows on ONE host   (the adversarial case)

    python tools/skew_bench.py --n 24000000 --hosts 4096 --cpus 8

Prints one JSON line: per-distribution admission reps (min-of-R in
one JVM), the max-host share, and admitted counts (uniform/zipf admit
~8·H; point90 admits 8·(1 + distinct tail hosts) — the quota is the
point: a hot host cannot buy throughput)."""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24_000_000)
    ap.add_argument("--hosts", type=int, default=4096)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from web_crawler_search_engine_spark.operators.scheduler import admit

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("skew-bench")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )

    n, hosts = args.n, args.hosts
    base = spark.range(0, n, 1, numPartitions=64).withColumnRenamed("id", "i")
    u = (F.col("i") + F.lit(0.5)) / F.lit(float(n))

    dists = {
        "uniform": F.pmod(F.col("i"), F.lit(hosts)).cast("int"),
        "zipf": F.least(
            F.greatest(
                (F.floor(F.pow(F.lit(float(hosts + 1)), u)) - 1).cast("int"),
                F.lit(0),
            ),
            F.lit(hosts - 1),
        ),
        "point90": F.when(u < 0.9, F.lit(0)).otherwise(
            (F.pmod(F.col("i"), F.lit(hosts - 1)) + 1).cast("int")
        ),
    }

    out: dict = {
        "metric": "admission_skew_sec",
        "n": n,
        "hosts": hosts,
        "cpus": args.cpus,
        "dists": {},
    }
    for name, host_rank in dists.items():
        url = F.concat(
            F.lit("https://h"),
            host_rank.cast("string"),
            F.lit(f".{name}.example.com/p/"),
            F.col("i").cast("string"),
        )
        pending = (
            base.select(
                F.xxhash64(url).alias("url_key"),
                F.concat(
                    F.lit("h"),
                    host_rank.cast("string"),
                    F.lit(f".{name}.example.com"),
                ).alias("host"),
                F.col("i").alias("discovery_seq"),
            )
            .persist(StorageLevel.MEMORY_ONLY)
        )
        pending.count()
        top_share = (
            pending.groupBy("host").count().agg(F.max("count")).collect()[0][0]
            / n
        )
        reps = []
        n_admitted = None
        for _ in range(args.reps):
            t0 = time.monotonic()
            n_admitted = admit(
                pending.withColumn("quota", F.lit(8)),
                max_quota=8,
                salt_buckets=16,
                key_col="url_key",
            ).count()
            reps.append(round(time.monotonic() - t0, 3))
        pending.unpersist()
        out["dists"][name] = {
            "max_host_share": round(top_share, 4),
            "admit_reps_sec": reps,
            "admit_min_sec": min(reps),
            "admitted": n_admitted,
        }
        print(f"[skew] {name}: min {min(reps):.2f}s", file=sys.stderr)

    mins = [d["admit_min_sec"] for d in out["dists"].values()]
    out["spread"] = round(max(mins) / min(mins), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
