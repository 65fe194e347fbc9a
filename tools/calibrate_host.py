"""Host scaling-ceiling calibration (no Spark).

Measures the box's own N->4N process-scaling ceiling for the two
workload classes a frontier round is made of, so BENCH/BASELINE.md can
separate engine-owned scaling from host-owned ceilings:

  * pure CPU: integer loop, no memory traffic
  * memory streaming: repeated numpy sums over a 1 GiB array

Each runs a FIXED total amount of work split over P processes, at
P=2 and P=8 (override with CALIB_PROCS="2,8"); efficiency =
(T_2 / T_8) / 4. Min of CALIB_REPS (default 2) reps. Prints one JSON
line per workload.
"""

import json
import multiprocessing as mp
import os
import time

import numpy as np

TASKS = 16  # fixed work units, divisible by both proc counts


def _cpu_task(_):
    acc = 0
    for i in range(30_000_000):
        acc ^= i * 2654435761 & 0xFFFFFFFF
    return acc


_BUF = None


def _stream_init():
    global _BUF
    _BUF = np.ones(1 << 27, dtype=np.float64)  # 1 GiB


def _stream_task(_):
    s = 0.0
    for _ in range(6):  # 6 GiB of traffic per task
        s += float(_BUF.sum())
    return s


def _run(task, procs, init=None) -> float:
    t0 = time.monotonic()
    with mp.get_context("spawn").Pool(procs, initializer=init) as pool:
        pool.map(task, range(TASKS))
    return time.monotonic() - t0


def main() -> None:
    procs = [int(p) for p in os.environ.get("CALIB_PROCS", "2,8").split(",")]
    reps = int(os.environ.get("CALIB_REPS", "2"))
    for name, task, init in [
        ("pure_cpu", _cpu_task, None),
        ("mem_stream", _stream_task, _stream_init),
    ]:
        times = {
            p: min(_run(task, p, init) for _ in range(reps)) for p in procs
        }
        lo, hi = min(procs), max(procs)
        eff = (times[lo] / times[hi]) / (hi / lo)
        print(
            json.dumps(
                {
                    "workload": name,
                    "times_sec": {str(p): round(t, 2) for p, t in times.items()},
                    "efficiency": round(eff, 3),
                    "procs": procs,
                    "tasks": TASKS,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
