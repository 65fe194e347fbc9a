"""Snapshot checkpoint store — Iceberg-shaped semantics on parquet.

The north_rule asks for Iceberg snapshots; this sandbox has no
Iceberg runtime jar, so this module provides the same contract with
plain parquet + an atomically-renamed JSON manifest per snapshot:

  * ``commit(round, tables={...})`` writes each full table to
    ``<root>/<name>/r<round>/`` and then atomically publishes
    ``manifest_r<round>.json`` + the LATEST pointer (os.replace).
    Readers resolve tables only through a manifest, so a killed run
    mid-write is invisible — the previous snapshot stays current
    (mirrors frontier.json checkpoint/resume, frontier.py:42-62).
  * ``commit(round, log_appends={...})`` appends a DELTA file group
    to an append-only log table (``<root>/<name>/d<round>/``); the
    manifest carries the live file list (Iceberg's manifest-list
    analog). ``load_log(name)`` reads base+deltas as one DataFrame.
    This is the O(round-delta) write path — the frontier status log,
    seen-Bloom word deltas, fetched pages, and token counts append
    per round instead of rewriting O(frontier) state (SURVEY §7.7.7).
  * ``commit(round, log_compact={...})`` replaces a log's base with a
    compacted table and clears its delta list (latest-wins/merge
    semantics are the CALLER's — the store only swaps file lists,
    like an Iceberg rewrite-data-files action).
  * ``latest_round()`` / ``load`` / ``load_log`` resume from the
    newest published snapshot; time travel via ``round_id=k``.

On a real cluster, swap this class for ``df.writeTo(table).append()``
against an Iceberg catalog — the engine only touches the interface.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# parquet column Bloom filters + dictionary stats on the key column:
# the exact-backstop semi scans (ledger ⋉ maybe_keys) and resume reads
# can skip row groups without touching data pages.
KEY_BLOOM_OPTIONS = {
    "parquet.bloom.filter.enabled#url_key": "true",
    "parquet.bloom.filter.expected.ndv#url_key": "1000000",
}


class SnapshotStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str | os.PathLike,
        write_parallelism: int | None = None,
    ):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        # A round commit writes up to 8 independent tables whose data
        # is tiny next to the fixed per-job cost (scheduling + file
        # commit): measured 4.15 s/round sequential at an 8k world,
        # ~0.5 s/job (tools/round_profile.py). Submitting them from
        # driver threads overlaps those fixed costs; every shared
        # cache (admitted/fetched/seq) is already materialized by the
        # round's earlier actions, so concurrent writes only read
        # caches plus their own small shuffles. On a real cluster this
        # is ordinary multi-job submission — big-table writes saturate
        # executors and serialize naturally inside the FIFO pool.
        if write_parallelism is None:
            write_parallelism = int(
                os.environ.get("SPARK_GRAFT_COMMIT_PARALLELISM", "8")
            )
        self.write_parallelism = max(int(write_parallelism), 1)

    # -- write ------------------------------------------------------------
    def commit(
        self,
        round_id: int,
        tables: dict[str, DataFrame] | None = None,
        partition_by: dict[str, list[str]] | None = None,
        log_appends: dict[str, DataFrame] | None = None,
        log_compact: dict[str, DataFrame] | None = None,
        options: dict[str, dict[str, str]] | None = None,
        meta: dict | None = None,
        carry_tables: bool = False,
    ) -> None:
        prev = self.manifest()
        # full tables are per-manifest (a round's manifest lists what
        # THAT round wrote — e.g. the per-round `admitted` table)
        # unless carry_tables is set (follow-up commits within the
        # same round: filter-delta append, compaction); log tables and
        # meta always carry their state forward.
        manifest = {
            "round": round_id,
            "tables": dict((prev or {}).get("tables", {})) if carry_tables else {},
            "logs": {
                k: dict(v) for k, v in ((prev or {}).get("logs", {})).items()
            },
            "meta": dict((prev or {}).get("meta", {})),
        }
        manifest["meta"].update(meta or {})

        def write(df: DataFrame, path: Path, name: str):
            writer = df.write.mode("overwrite")
            for key, val in (options or {}).get(name, {}).items():
                writer = writer.option(key, val)
            for col in (partition_by or {}).get(name, []):
                writer = writer.partitionBy(col)
            writer.parquet(str(path))

        # stage every independent write, then run them concurrently —
        # the manifest below is only assembled (deterministically, in
        # declaration order) and published after EVERY write succeeds,
        # so the crash/atomicity contract is unchanged: any failure
        # leaves the previous snapshot current and the partial files
        # unreferenced.
        jobs: list[tuple[DataFrame, Path, str]] = []
        for name, df in (tables or {}).items():
            path = self.root / name / f"r{round_id}"
            jobs.append((df, path, name))
            manifest["tables"][name] = str(path)
        for name, df in (log_compact or {}).items():
            path = self.root / name / f"c{round_id}"
            jobs.append((df, path, name))
            manifest["logs"][name] = {"base": str(path), "deltas": []}
        for name, df in (log_appends or {}).items():
            path = self.root / name / f"d{round_id}"
            info = manifest["logs"].get(name, {"base": None, "deltas": []})
            if str(path) in info.get("deltas", []):
                # a second append to the same log under one round would
                # OVERWRITE the earlier delta's files while listing the
                # path twice (double-counted rows over lost data) — a
                # caller-contract violation that must be loud, not
                # silent (the r2-review indexer round-id bug class).
                raise ValueError(
                    f"log {name!r} already has a delta for round "
                    f"{round_id}; use a fresh round id"
                )
            jobs.append((df, path, name))
            manifest["logs"][name] = {
                "base": info.get("base"),
                "deltas": list(info.get("deltas", [])) + [str(path)],
            }
        if len(jobs) <= 1 or self.write_parallelism == 1:
            for df, path, name in jobs:
                write(df, path, name)
        else:
            with ThreadPoolExecutor(
                max_workers=min(self.write_parallelism, len(jobs))
            ) as pool:
                futures = [
                    pool.submit(write, df, path, name)
                    for df, path, name in jobs
                ]
                for fut in futures:
                    fut.result()

        tmp = self.root / f".manifest_r{round_id}.tmp"
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, self.root / f"manifest_r{round_id}.json")
        tmp2 = self.root / ".LATEST.tmp"
        tmp2.write_text(str(round_id))
        os.replace(tmp2, self.root / "LATEST")

    # -- read -------------------------------------------------------------
    def latest_round(self) -> int | None:
        p = self.root / "LATEST"
        if not p.exists():
            return None
        return int(p.read_text().strip())

    def manifest(self, round_id: int | None = None) -> dict | None:
        r = round_id if round_id is not None else self.latest_round()
        if r is None:
            return None
        p = self.root / f"manifest_r{r}.json"
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def load(self, name: str, round_id: int | None = None) -> DataFrame:
        m = self.manifest(round_id)
        if m is None or name not in m["tables"]:
            raise FileNotFoundError(f"no snapshot for table {name!r}")
        return self.spark.read.parquet(m["tables"][name])

    def log_paths(self, name: str, round_id: int | None = None) -> list[str]:
        m = self.manifest(round_id)
        if m is None or name not in m.get("logs", {}):
            raise FileNotFoundError(f"no log table {name!r}")
        info = m["logs"][name]
        return ([info["base"]] if info.get("base") else []) + list(
            info.get("deltas", [])
        )

    def load_log(self, name: str, round_id: int | None = None) -> DataFrame:
        return self.spark.read.parquet(*self.log_paths(name, round_id))

    def load_log_deltas(
        self, name: str, round_id: int | None = None
    ) -> DataFrame | None:
        """Only the UNCOMPACTED delta file groups of a log (no base),
        or None when every row has been folded into the base. The
        crawl's pending view reads the frontier log's deltas as its
        removal set — a window bounded by the compaction cadence."""
        m = self.manifest(round_id)
        if m is None or name not in m.get("logs", {}):
            return None
        deltas = m["logs"][name].get("deltas", [])
        if not deltas:
            return None
        return self.spark.read.parquet(*deltas)

    def load_log_delta(self, name: str, delta_round: int) -> DataFrame:
        """Just the delta file group appended at ``delta_round``."""
        suffix = f"{os.sep}d{delta_round}"
        for p in self.log_paths(name):
            if p.endswith(suffix):
                return self.spark.read.parquet(p)
        raise FileNotFoundError(f"log {name!r} has no delta for round {delta_round}")

    def log_delta_count(self, name: str, round_id: int | None = None) -> int:
        """Number of live (uncompacted) delta file groups — the
        caller's compaction trigger."""
        m = self.manifest(round_id)
        if m is None or name not in m.get("logs", {}):
            return 0
        return len(m["logs"][name].get("deltas", []))

    def rounds(self) -> list[int]:
        return sorted(
            int(p.stem.split("_r")[1]) for p in self.root.glob("manifest_r*.json")
        )
