"""N-vs-4N EXECUTOR scaling via Spark local-cluster mode.

The north_rule's criterion is stated over executors, not threads.
``local[N]`` scales threads inside ONE JVM sharing one heap — so the
r2/r3 evidence had to argue through the host's memory-bandwidth
ceiling. ``local-cluster[N,C,M]`` spawns N REAL executor JVMs, each
with its OWN heap, GC, and shuffle endpoints: going 1 → 4 executors
at fixed per-executor cores+memory adds heap capacity with executor
count — the semantics of adding cluster nodes — leaving shared
memory BANDWIDTH as the only resource a single box cannot multiply.

This driver runs the engine's frontier round (bench.py, identical
64-partition layout, min-of-R in each cluster) at N=1 and N=4
executors of 2 cores / fixed heap each, brackets both runs with the
host calibration, and reports efficiency = (T_1 / T_4) / 4.

    python tools/executor_scaling.py            # 24M, 1 vs 4 execs
    python tools/executor_scaling.py --n 24000000 --execs 1 4 \
        --cores 2 --mem-mb 6144 --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_level(n_execs: int, cores: int, mem_mb: int, n: int, reps: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_MASTER": f"local-cluster[{n_execs},{cores},{mem_mb}]",
            "SPARK_GRAFT_EXEC_MEM": f"{mem_mb - 1024}m",
            "SPARK_GRAFT_SF_DIR": env.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
            ),
            "SPARK_GRAFT_FRONTIER": str(n),
            "SPARK_GRAFT_BENCH_QUERIES": "none",  # frontier round only
            "SPARK_GRAFT_BENCH_SIDECARS": "0",
            "SPARK_GRAFT_BENCH_REPS": str(reps),
            # driver does no heavy work in the round; keep its heap
            # small so executor heaps dominate the footprint
            "SPARK_GRAFT_DRIVER_MEM": "6g",
        }
    )
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    lines = [
        ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")
    ]
    if not lines:
        tail = "\n".join(out.stderr.strip().splitlines()[-15:])
        raise RuntimeError(
            f"bench.py produced no JSON at {n_execs} executors "
            f"(exit {out.returncode}); stderr tail:\n{tail}"
        )
    d = json.loads(lines[-1])
    return {
        "executors": n_execs,
        "cores_each": cores,
        "total_cores": n_execs * cores,
        "reps_sec": d["reps_sec"],
        "min_sec": d["frontier_sched_sec"],
        "phases": d.get("phases", {}),
        "phase_reps": d.get("phase_reps", {}),
    }


def calibrate() -> list[dict]:
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "calibrate_host.py")],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    return [
        json.loads(ln)
        for ln in out.stdout.strip().splitlines()
        if ln.startswith("{")
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24_000_000)
    ap.add_argument("--execs", type=int, nargs=2, default=[1, 4])
    ap.add_argument("--cores", type=int, default=2)
    ap.add_argument("--mem-mb", type=int, default=6144)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-calibrate", action="store_true")
    ap.add_argument(
        "--lo-first",
        action="store_true",
        help="run the low-executor level first (flip the host-drift "
        "bias direction; run both orders to bracket it)",
    )
    args = ap.parse_args()

    cal_pre = [] if args.no_calibrate else calibrate()
    lo, hi = sorted(args.execs)
    order = [lo, hi] if args.lo_first else [hi, lo]
    results = {}
    for level in order:
        print(f"[execscale] running {level} executors", file=sys.stderr)
        results[level] = run_level(
            level, args.cores, args.mem_mb, args.n, args.reps
        )
        print(
            f"[execscale] {level} execs: {results[level]['min_sec']}s",
            file=sys.stderr,
        )
    lo_res, hi_res = results[lo], results[hi]
    cal_post = [] if args.no_calibrate else calibrate()

    ratio = hi // lo
    eff = (lo_res["min_sec"] / hi_res["min_sec"]) / ratio
    phase_eff = {}
    for ph, lo_reps in lo_res["phase_reps"].items():
        hi_reps = hi_res["phase_reps"].get(ph)
        if hi_reps and min(hi_reps) > 0:
            phase_eff[ph] = round((min(lo_reps) / min(hi_reps)) / ratio, 3)
    print(
        json.dumps(
            {
                "metric": "executor_scaling_eff",
                "n": args.n,
                "levels": [lo_res, hi_res],
                "efficiency": round(eff, 3),
                "phase_eff": phase_eff,
                "cal_pre": cal_pre,
                "cal_post": cal_post,
            }
        )
    )


if __name__ == "__main__":
    main()
