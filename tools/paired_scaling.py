"""Interleaved N-vs-4N scaling measurement that differences out host
drift.

The sequential design (all c8 reps, then all c2 reps — window_bench.sh)
keeps losing to this guest's bandwidth weather: two of three watcher
windows decayed DURING a leg, and a drift between the legs biases the
ratio in either direction. This tool runs the two parallelism levels as
two long-lived worker JVMs (local[HI] and local[LO]) that alternate
single measured rounds under a file-baton protocol:

    c8 rep0 -> c2 rep0 -> c8 rep1 -> c2 rep1 -> ...

Each worker pays setup (cache + ledger filter build) ONCE, then runs
only the measured round when it holds the baton; the partner JVM idles
(no CPU) meanwhile. Each rep PAIR therefore samples adjacent host
states a few minutes apart instead of half an hour apart, and the
per-pair ratios (t_lo/t_hi)/(HI/LO) expose drift directly: a tight
pair spread IS the evidence the window held.

Usage:
    python tools/paired_scaling.py            # 24M, 8 vs 2, 3 pairs
    python tools/paired_scaling.py --n 24000000 --hi 8 --lo 2 --pairs 3

Prints one JSON line: per-rep round seconds per level, per-pair
efficiencies, min-based efficiency, and per-phase minima.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def worker(cpus: int, n: int, pairs: int, baton: Path, role: str) -> None:
    sys.path.insert(0, str(ROOT))
    from pyspark.sql import SparkSession

    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"paired-{role}")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "64"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", mem)
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{mem} -XX:+AlwaysPreTouch -XX:+UseParallelGC",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    state = bench.setup_frontier_state(spark, n)
    # one warmup round OUTSIDE the protocol so JIT/codegen warmup never
    # lands in a measured pair
    bench.run_frontier_round(spark, state)
    (baton / f"ready_{role}").touch()
    for k in range(pairs):
        turn = baton / f"turn_{role}_{k}"
        while not turn.exists():
            time.sleep(0.2)
        rep = bench.run_frontier_round(spark, state)
        (baton / f"done_{role}_{k}.json").write_text(json.dumps(rep))
    bench.teardown_frontier_state(state)
    spark.stop()


def orchestrate(args: argparse.Namespace) -> None:
    baton = Path(tempfile.mkdtemp(prefix="paired_scaling_"))
    env = dict(os.environ)
    procs = {}
    for role, cpus in (("hi", args.hi), ("lo", args.lo)):
        procs[role] = subprocess.Popen(
            [
                sys.executable,
                __file__,
                "--worker",
                role,
                "--cpus",
                str(cpus),
                "--n",
                str(args.n),
                "--pairs",
                str(args.pairs),
                "--baton",
                str(baton),
            ],
            env=env,
            stderr=subprocess.DEVNULL if args.quiet else None,
        )
    # workers set up concurrently (setup is unmeasured), then the
    # measured rounds strictly alternate
    for role in ("hi", "lo"):
        while not (baton / f"ready_{role}").exists():
            if procs[role].poll() is not None:
                raise SystemExit(f"worker {role} died during setup")
            time.sleep(0.5)
    reps: dict[str, list[dict]] = {"hi": [], "lo": []}
    for k in range(args.pairs):
        for role in ("hi", "lo"):
            (baton / f"turn_{role}_{k}").touch()
            out = baton / f"done_{role}_{k}.json"
            while not out.exists():
                if procs[role].poll() is not None:
                    raise SystemExit(f"worker {role} died mid-run")
                time.sleep(0.5)
            reps[role].append(json.loads(out.read_text()))
            t = reps[role][-1]["frontier_sched_sec"]
            print(f"[pair {k}] {role} round {t:.2f}s", file=sys.stderr)
    for p in procs.values():
        p.wait(timeout=120)

    factor = args.hi / args.lo
    hi_s = [r["frontier_sched_sec"] for r in reps["hi"]]
    lo_s = [r["frontier_sched_sec"] for r in reps["lo"]]
    pair_eff = [round((lo / hi) / factor, 3) for hi, lo in zip(hi_s, lo_s)]
    phases = {
        p: {
            "hi_min": min(r["phases"][p] for r in reps["hi"]),
            "lo_min": min(r["phases"][p] for r in reps["lo"]),
        }
        for p in reps["hi"][0]["phases"]
    }
    for p, d in phases.items():
        d["eff"] = round((d["lo_min"] / d["hi_min"]) / factor, 3)
    out = {
        "metric": "paired_scaling_eff",
        "n": args.n,
        "hi_cpus": args.hi,
        "lo_cpus": args.lo,
        "hi_reps_sec": hi_s,
        "lo_reps_sec": lo_s,
        "pair_eff": pair_eff,
        "best_pair_eff": max(pair_eff),
        "min_based_eff": round((min(lo_s) / min(hi_s)) / factor, 3),
        "phase_eff": phases,
    }
    print(json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24_000_000)
    ap.add_argument("--hi", type=int, default=8)
    ap.add_argument("--lo", type=int, default=2)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--worker", default=None)
    ap.add_argument("--cpus", type=int, default=0)
    ap.add_argument("--baton", default=None)
    args = ap.parse_args()
    if args.worker:
        worker(args.cpus, args.n, args.pairs, Path(args.baton), args.worker)
    else:
        orchestrate(args)


if __name__ == "__main__":
    main()
