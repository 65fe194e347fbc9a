"""Streaming frontier ingestion: the crawl engine's X1 + P7 pipeline
over a continuously-fed link source.

The reference engine (and our batch plans) treat the frontier as an
iterative fixpoint — rounds, not a stream (SURVEY §7.5). A deployment
that receives discovered links continuously (e.g. fetchers publishing
to a drop directory / object store prefix) needs the same two
semantics as unbounded operators:

  * URL-seen dedup (X1): streaming ``dropDuplicates`` on url_key —
    first occurrence wins across micro-batches, exactly the
    first-discovery-wins rule of frontier.py:137-146. State is the
    seen-key set; at 10^10 that state must live in the batch engine's
    ledger + Bloom (operators/seen.py), so production composes this
    stream with a foreachBatch anti-join against the ledger — the
    in-stream dropDuplicates then only bounds within-stream dupes.
  * Politeness admission (P7): at most ``budget`` admissions per host
    over the stream's life, in discovery_seq order within each
    micro-batch, counts carried in GroupState across batches
    (applyInPandasWithState) — the streaming twin of
    operators/scheduler.admit.

``trigger(availableNow=True)`` over a closed directory reproduces the
batch result (tested in tests/unit/test_streaming.py); the same query
runs unchanged on a live source.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LINK_DELTA_SCHEMA = StructType(
    [
        StructField("url_key", LongType(), False),
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("discovery_seq", LongType(), False),
    ]
)

_ADMIT_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("url_key", LongType(), False),
        StructField("url", StringType(), False),
        StructField("discovery_seq", LongType(), False),
        StructField("admitted_rank", IntegerType(), False),
    ]
)

_STATE_SCHEMA = StructType([StructField("admitted", IntegerType(), False)])


def frontier_link_stream(spark: SparkSession, links_dir: str) -> DataFrame:
    """File-source stream of discovered-link deltas (one parquet file
    per producer flush; schema LINK_DELTA_SCHEMA)."""
    return spark.readStream.schema(LINK_DELTA_SCHEMA).parquet(links_dir)


def dedup_first_seen(links: DataFrame) -> DataFrame:
    """X1 streaming twin: keep the first occurrence of each url_key
    across the whole stream (stateful streaming dropDuplicates)."""
    return links.dropDuplicates(["url_key"])


def _make_host_admitter(budget: int):
    def admit_fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        admitted = state.get[0] if state.exists else 0
        # concat before sorting: a host's rows can span Arrow chunks
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["discovery_seq", "url_key"])
            room = max(budget - admitted, 0)
            take = pdf.head(room)
            if len(take):
                yield pd.DataFrame(
                    {
                        "host": key[0],
                        "url_key": take["url_key"].to_numpy(),
                        "url": take["url"].to_numpy(),
                        "discovery_seq": take["discovery_seq"].to_numpy(),
                        "admitted_rank": range(
                            admitted + 1, admitted + len(take) + 1
                        ),
                    }
                )
                admitted += len(take)
        state.update((admitted,))

    return admit_fn


def admit_stream(links: DataFrame, budget: int) -> DataFrame:
    """P7 streaming twin: per-host admission budget over the stream's
    life, discovery_seq order within each micro-batch, GroupState
    counts across batches."""
    keyed = links.select("host", "url_key", "url", "discovery_seq")
    return keyed.groupBy("host").applyInPandasWithState(
        _make_host_admitter(budget),
        outputStructType=_ADMIT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def frontier_ingest_stream(
    spark: SparkSession, links_dir: str, budget: int
) -> DataFrame:
    """dedup-then-admit composition over a link drop directory."""
    return admit_stream(
        dedup_first_seen(frontier_link_stream(spark, links_dir)), budget
    )


def start_ledger_ingest(
    spark: SparkSession,
    links_dir: str,
    store,
    ckpt_dir: str,
    budget: int,
    ledger_log: str = "frontier_log",
    out_log: str = "stream_admitted",
    available_now: bool = True,
    ledger_store=None,
):
    """Production composition of the stream with the BATCH engine's
    persistent state (the in-stream dropDuplicates state cannot hold a
    10^10-key seen set): each micro-batch runs through foreachBatch as
    a normal batch plan —

      1. within-batch first-discovery-wins dedup (X1 window rule),
      2. anti-join against the committed URL ledger in ``store``
         (exactly the CrawlJob seen check; at scale the Bloom
         pre-filter of operators/seen.py slots in unchanged),
      3. per-host top-``budget`` admission by discovery_seq (P7, the
         batch admit with skinny ranking),
      4. append to the ``out_log`` snapshot log keyed by batch_id.
         foreachBatch is at-least-once, so replays are handled
         explicitly: a batch whose delta is already in the committed
         manifest is SKIPPED (re-running it against the updated
         stream_seen log would compute an empty admitted set and
         clobber the first attempt); a batch that crashed before its
         atomic manifest commit leaves no manifest entry, so the
         replay recomputes against exactly the pre-crash state and
         overwrites the orphaned files. Net effect: exactly-once.

    ``store`` receives the stream's commits, keyed by batch_id —
    give the stream its OWN SnapshotStore directory (round ids are
    batch ids); pass the crawl's store as ``ledger_store`` to check
    against its URL ledger (defaults to ``store``).

    Returns the StreamingQuery; availableNow=True drains a closed
    directory and stops (the tested mode)."""
    from ..operators.scheduler import admit
    from pyspark.sql import Window

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        bid = int(batch_id)
        committed = (store.manifest() or {}).get("logs", {})
        if any(
            p.endswith(f"{_os.sep}d{bid}")
            for p in committed.get(out_log, {}).get("deltas", [])
        ):
            return  # at-least-once replay of an already-committed batch
        w_first = Window.partitionBy("url_key").orderBy("discovery_seq")
        batch_unique = (
            batch_df.withColumn("_rn", F.row_number().over(w_first))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        unseen = batch_unique
        for src, log in ((ledger_store or store, ledger_log), (store, "stream_seen")):
            try:
                seen = src.load_log(log).select("url_key")
            except FileNotFoundError:
                continue
            unseen = unseen.join(seen, "url_key", "left_anti")
        admitted = admit(
            unseen.withColumn("quota", F.lit(budget)),
            max_quota=budget,
            key_col="url_key",
        ).drop("quota")
        # stream_seen makes X1 hold ACROSS micro-batches (a key seen in
        # batch 1 is never re-admitted by batch 2). Keys beyond the
        # batch budget are not lost: they land in stream_pending for
        # the batch engine to enqueue (the full retained frontier is
        # CrawlJob's job, not the stream's). All logs commit in one
        # atomic manifest keyed by batch_id.
        unseen = unseen.persist()
        over_budget = unseen.join(
            admitted.select("url_key"), "url_key", "left_anti"
        )
        store.commit(
            int(batch_id),
            log_appends={
                out_log: admitted,
                "stream_seen": unseen.select("url_key"),
                "stream_pending": over_budget,
            },
            carry_tables=True,
        )
        unseen.unpersist()

    q = (
        frontier_link_stream(spark, links_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt_dir)
    )
    if available_now:
        q = q.trigger(availableNow=True)
    return q.start()
