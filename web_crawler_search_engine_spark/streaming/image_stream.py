"""Streaming image ingestion: X3 phash dedup as a continuous pipeline
(graft cell pyspark × image).

The batch engine dedups fetched images by perceptual hash first-seen
(images/udfs.phash_dedup; reference X3 — identical pixels ⇒ identical
phash). A deployment whose fetchers publish image+caption rows
continuously (drop directory / object-store prefix) needs the same
rule across micro-batches, with the seen-phash state in a persistent
ledger rather than stream state — the exact composition of
frontier_stream.start_ledger_ingest, keyed by phash instead of
url_key:

  1. within-batch first-arrival-wins dedup (window on phash),
  2. anti-join against the committed ``image_seen`` phash ledger
     (at 10^10 the Bloom pre-filter of operators/seen.py slots in
     unchanged — phashes are int64 keys exactly like url_key),
  3. kept rows append to ``stream_images``; the dropped duplicates'
     (phash, caption) rows append to ``stream_carry`` so caption
     carry-through (north_star) survives streaming dedup — the batch
     q_caption_carry rollup consumes them,
  4. one atomic manifest commit keyed by batch_id; at-least-once
     foreachBatch replays of an already-committed batch are SKIPPED,
     so the log is exactly-once (same argument as frontier_stream).

``trigger(availableNow=True)`` over a closed directory reproduces the
batch phash_dedup result (tests/unit/test_streaming_images.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_DELTA_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("url", StringType(), False),
        StructField("phash", LongType(), False),
        StructField("caption", StringType(), True),
        StructField("arrival_seq", LongType(), False),
    ]
)


def image_delta_stream(spark: SparkSession, images_dir: str) -> DataFrame:
    """File-source stream of fetched image+caption rows (one parquet
    file per fetcher flush; schema IMAGE_DELTA_SCHEMA)."""
    return spark.readStream.schema(IMAGE_DELTA_SCHEMA).parquet(images_dir)


def start_image_ingest(
    spark: SparkSession,
    images_dir: str,
    store,
    ckpt_dir: str,
    seen_log: str = "image_seen",
    out_log: str = "stream_images",
    carry_log: str = "stream_carry",
    available_now: bool = True,
):
    """Returns the StreamingQuery; availableNow=True drains a closed
    directory and stops (the tested mode). ``store`` is a
    SnapshotStore of the stream's own (batch-id-keyed) commits."""
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
        w_first = Window.partitionBy("phash").orderBy(
            "arrival_seq", "image_id"
        )
        ranked = batch_df.withColumn(
            "_rn", F.row_number().over(w_first)
        ).persist()
        batch_first = ranked.filter(F.col("_rn") == 1).drop("_rn")
        batch_dups = ranked.filter(F.col("_rn") > 1).drop("_rn")
        try:
            seen = store.load_log(seen_log).select("phash")
        except FileNotFoundError:
            seen = None
        if seen is not None:
            fresh = batch_first.join(seen, "phash", "left_anti")
            stale = batch_first.join(seen, "phash", "left_semi")
        else:
            fresh, stale = batch_first, None
        # carried captions: within-batch dups + batch winners whose
        # phash was already committed by an earlier batch
        carry = batch_dups.select("phash", "image_id", "caption")
        if stale is not None:
            carry = carry.unionByName(
                stale.select("phash", "image_id", "caption")
            )
        store.commit(
            bid,
            log_appends={
                out_log: fresh,
                seen_log: fresh.select("phash"),
                carry_log: carry,
            },
            carry_tables=True,
        )
        ranked.unpersist()

    q = (
        image_delta_stream(spark, images_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt_dir)
    )
    if available_now:
        q = q.trigger(availableNow=True)
    return q.start()
