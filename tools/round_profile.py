"""Where does the flat per-round crawl cost go?

The 55k full-chain run (BENCH/BASELINE.md r3.6) spends ~10.7 s/round
of roughly data-independent overhead across ~12 Spark actions per
round: 7-8 snapshot/log writes (pending, robots, admitted, metrics,
frontier_log, token_log, pages, seen_bloom) plus the post-commit
metrics re-aggregate and pending count, plus the seq-assign /
Bloom-probe jobs. This tool times every `DataFrameWriter.parquet`
call (attributed to its table by path) and every collect/count
action inside `run_round`, over a mid-size world, and prints a
per-round breakdown so optimization is aimed by measurement:

    python tools/round_profile.py --n 8000 --cpus 8

NOTE: under the r3.7 threaded commit the per-table write times are
THREAD-wall (they overlap), so their sum exceeds the real wall time
and `non_write_sec_per_round` can go negative; set
SPARK_GRAFT_COMMIT_PARALLELISM=1 for additive attribution.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8000)
    ap.add_argument("--hosts", type=int, default=60)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--round-duration", type=float, default=60.0)
    ap.add_argument("--max-rounds", type=int, default=200)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    import pyspark.sql.readwriter as RW

    from web_crawler_search_engine_spark.plans.crawl import (
        CrawlConfig,
        CrawlJob,
    )
    from web_crawler_search_engine_spark.sources.corpus import (
        POLITENESS,
        USER_AGENT,
        corpus_df,
        generate_world,
        robots_src_df,
    )

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("round-profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # -- instrument every parquet write, attributed by table dir name --
    write_times: dict[str, list[float]] = defaultdict(list)
    orig_parquet = RW.DataFrameWriter.parquet

    def timed_parquet(self, path, *a, **kw):
        t = time.monotonic()
        out = orig_parquet(self, path, *a, **kw)
        # <ck_root>/<table>/<r|d|c><round> -> attribute to <table>
        table = Path(str(path)).parent.name
        write_times[table].append(time.monotonic() - t)
        return out

    RW.DataFrameWriter.parquet = timed_parquet

    # -- instrument collect/count actions, attributed to the deepest
    #    engine (web_crawler_search_engine_spark/) caller frame --
    import traceback

    # pyspark 4: the abstract pyspark.sql.DataFrame delegates to the
    # concrete classic class — patch the class whose methods run
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    action_times: dict[str, list[float]] = defaultdict(list)

    def _caller() -> str:
        for fr in reversed(traceback.extract_stack(limit=25)):
            if "web_crawler_search_engine_spark" in fr.filename:
                return f"{Path(fr.filename).name}:{fr.lineno}"
        return "tool"

    def _timed(name, orig):
        def run(self, *a, **kw):
            t = time.monotonic()
            out = orig(self, *a, **kw)
            action_times[f"{name}@{_caller()}"].append(
                time.monotonic() - t
            )
            return out

        return run

    _DF.collect = _timed("collect", _DF.collect)
    _DF.count = _timed("count", _DF.count)

    world = generate_world(
        n=args.n, hosts=args.hosts, seed=7, with_images=False
    )
    cfg = CrawlConfig(
        root_domains=world.root_domains,
        user_agent=USER_AGENT,
        politeness=POLITENESS,
        round_duration=args.round_duration,
    )
    job = CrawlJob(
        spark,
        corpus_df(spark, world),
        robots_src_df(spark, world),
        cfg,
        checkpoint_dir=tempfile.mkdtemp(prefix="roundprof_ck_"),
    )
    job.start(world.seeds)

    round_secs: list[float] = []
    per_round_writes: list[float] = []
    rounds = 0
    while rounds < args.max_rounds:
        before = {k: sum(v) for k, v in write_times.items()}
        t = time.monotonic()
        info = job.run_round()
        round_secs.append(time.monotonic() - t)
        after = {k: sum(v) for k, v in write_times.items()}
        per_round_writes.append(
            sum(after.values()) - sum(before.values())
        )
        rounds += 1
        if info.get("pending", 0) == 0:
            break

    total = sum(round_secs)
    writes_total = {k: round(sum(v), 2) for k, v in write_times.items()}
    writes_calls = {k: len(v) for k, v in write_times.items()}
    out = {
        "n_world": args.n,
        "cpus": args.cpus,
        "rounds": rounds,
        "crawl_sec": round(total, 2),
        "sec_per_round": round(total / rounds, 2),
        "write_sec_total": round(sum(sum(v) for v in write_times.values()), 2),
        "write_sec_per_round": round(
            sum(sum(v) for v in write_times.values()) / rounds, 2
        ),
        "write_sec_by_table": dict(
            sorted(writes_total.items(), key=lambda kv: -kv[1])
        ),
        "write_calls_by_table": writes_calls,
        "non_write_sec_per_round": round(
            (total - sum(sum(v) for v in write_times.values())) / rounds, 2
        ),
        "action_sec_by_site": dict(
            sorted(
                (
                    (k, round(sum(v), 2))
                    for k, v in action_times.items()
                    if k.split("@")[1] != "tool"
                ),
                key=lambda kv: -kv[1],
            )
        ),
        "action_calls_by_site": {
            k: len(v)
            for k, v in action_times.items()
            if k.split("@")[1] != "tool"
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
