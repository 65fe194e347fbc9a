"""Streaming HLL vocabulary sketch: mergeable registers maintained
across micro-batches with exactly-once commits.

The streaming twin of the batch ``q_hll_distinct``
(plans/catalog.py): a continuous document feed needs running
distinct-count telemetry (vocabulary size, unique URL estimates)
without ever re-scanning history. HLL registers make that exact-cost:

  1. per micro-batch: tokens → register DELTA
     (functions/sketches.py ``hll_registers`` — same portable hash as
     the batch query and the DuckDB oracle, so batch, stream, and
     oracle registers are bit-identical),
  2. merge into the standing table with an elementwise max
     (``merge_registers`` — both sides m-bounded, a dimension-sized
     full-outer join however much history the registers summarize),
  3. one atomic manifest commit per batch_id carrying the merged
     table + the batch marker; an at-least-once foreachBatch replay
     of a committed batch is skipped (same exactly-once idiom as
     text_stream.py / frontier_stream.py).

Batching is invisible by construction — max is associative and
commutative — so availableNow over N flushes equals the one-shot
batch registers (tested in tests/unit/test_streaming_sketch.py).

Scale shape: per batch one projection + one m-bounded groupBy + one
m-bounded merge join. The standing state is m rows TOTAL at any
corpus size — the reason a sketch, not a count-distinct, is the
streaming primitive.

The committed-batch marker is kept as an explicit id list here
(exact, replay-order-agnostic — the tested contract). On a
months-long production stream that list grows O(batches); the
standard bound is a high-water mark per stream-checkpoint generation
(file-source batch ids are monotone within a checkpoint), which the
manifest meta accommodates without changing the commit protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sketches import (
    cms_cells,
    cms_counters,
    hll_estimate,
    hll_registers,
    merge_counters,
    merge_registers,
)

REGS_TABLE = "hll_regs"
CMS_TABLE = "cms_counters"


def _tokens(df: DataFrame) -> DataFrame:
    return df.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")


def start_sketch_ingest(
    spark: SparkSession,
    docs_dir: str,
    store,
    ckpt_dir: str,
    available_now: bool = True,
):
    """Maintain the register table over a (doc_id, text) drop
    directory. Returns the StreamingQuery; availableNow=True drains a
    closed directory and stops (the tested mode)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        meta = (store.manifest() or {}).get("meta", {}).get("hll", {})
        done = meta.get("batches", [])
        if bid in done:
            return  # at-least-once replay of an already-committed batch
        delta = hll_registers(_tokens(batch_df), "token")
        try:
            base = store.load(REGS_TABLE)
        except FileNotFoundError:
            base = None
        merged = delta if base is None else merge_registers(base, delta)
        # localCheckpoint: the merged table must materialize BEFORE
        # the commit overwrites the base parquet it reads from
        merged = merged.localCheckpoint(eager=True)
        store.commit(
            bid,
            tables={REGS_TABLE: merged},
            meta={"hll": {"batches": sorted(done + [bid])}},
            carry_tables=True,
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(docs_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt_dir)
    )
    if available_now:
        stream = stream.trigger(availableNow=True)
    return stream.start()


def distinct_estimate(store) -> float:
    """The running estimate — a scalar read over ≤ m register rows."""
    regs = [
        (r["bucket"], r["m_j"]) for r in store.load(REGS_TABLE).collect()
    ]
    return hll_estimate(regs)


def start_cms_ingest(
    spark: SparkSession,
    docs_dir: str,
    store,
    ckpt_dir: str,
    available_now: bool = True,
):
    """Streaming Count–Min counters over the same drop directory.
    Same shape as the HLL ingest with one crucial difference: the
    merge is cellwise ADDITION (functions/sketches.merge_counters),
    which is not idempotent — the committed batch marker is what
    turns foreachBatch's at-least-once into exactly-once, and the
    replay test asserts a re-delivered batch does NOT double-count."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        meta = (store.manifest() or {}).get("meta", {}).get("cms", {})
        done = meta.get("batches", [])
        if bid in done:
            return
        delta = cms_counters(_tokens(batch_df), "token")
        try:
            base = store.load(CMS_TABLE)
        except FileNotFoundError:
            base = None
        merged = delta if base is None else merge_counters(base, delta)
        merged = merged.localCheckpoint(eager=True)
        store.commit(
            bid,
            tables={CMS_TABLE: merged},
            meta={"cms": {"batches": sorted(done + [bid])}},
            carry_tables=True,
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(docs_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt_dir)
    )
    if available_now:
        stream = stream.trigger(availableNow=True)
    return stream.start()


def frequency_estimate(spark: SparkSession, store, token: str) -> int:
    """Point query: min over the d counters the token hashes to —
    a d-row lookup against the d·w-bounded standing table."""
    probe = cms_cells(
        spark.createDataFrame([(token,)], "token string"), "token"
    )
    # left join from the probe side: a cell absent from the counter
    # table IS a zero counter, and min(…, 0) must see it
    row = (
        probe.join(store.load(CMS_TABLE), ["row", "col"], "left")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
        .collect()[0]
    )
    return int(row["est"] or 0)
