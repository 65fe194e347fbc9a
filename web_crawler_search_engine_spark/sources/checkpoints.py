"""Snapshot checkpoint store — Iceberg-shaped semantics on parquet.

The north_rule asks for Iceberg snapshots; this sandbox has no
Iceberg runtime jar, so this module provides the same contract with
plain parquet + an atomically-renamed JSON manifest per snapshot:

  * ``commit(round, {name: df})`` writes each table to
    ``<root>/<name>/r<round>/`` and then atomically publishes
    ``manifest_r<round>.json`` + the LATEST pointer (os.replace).
    Readers resolve tables only through a manifest, so a killed run
    mid-write is invisible — the previous snapshot stays current
    (mirrors frontier.json checkpoint/resume, frontier.py:42-62).
  * ``latest()`` / ``load(name)`` resume from the newest published
    snapshot; time travel via ``load(name, round=k)``.

On a real cluster, swap this class for ``df.writeTo(table).append()``
against an Iceberg catalog — the engine only touches the interface.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str | os.PathLike):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- write ------------------------------------------------------------
    def commit(
        self,
        round_id: int,
        tables: dict[str, DataFrame],
        partition_by: dict[str, list[str]] | None = None,
    ) -> None:
        manifest = {"round": round_id, "tables": {}}
        for name, df in tables.items():
            path = self.root / name / f"r{round_id}"
            writer = df.write.mode("overwrite")
            for col in (partition_by or {}).get(name, []):
                writer = writer.partitionBy(col)
            writer.parquet(str(path))
            manifest["tables"][name] = str(path)
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

    def rounds(self) -> list[int]:
        return sorted(
            int(p.stem.split("_r")[1]) for p in self.root.glob("manifest_r*.json")
        )
