"""Streaming vector ingestion with incremental IVF index maintenance —
the streaming twin of plans/ann.py (the LSM shape every production
vector store uses: small unsorted deltas + periodically compacted
bucket-partitioned segments).

An embedding pipeline that publishes vectors continuously (each doc's
encoder output) needs them searchable immediately AND laid out for
partition-pruned multiprobe search at rest. Per micro-batch:

  1. assign the 8-bit coarse-quantizer cell
     (functions/vectors.lsh_bucket_col — identical integers to the
     batch path, so stream- and batch-built indexes agree cell for
     cell),
  2. append the bucketed rows to the ``ivf_vectors`` log in one
     atomic manifest commit (exactly-once: the committed batch id is
     recorded in the manifest meta; at-least-once foreachBatch
     replays of a committed batch are skipped — same argument as
     frontier_stream),
  3. every ``compact_every`` deltas, the SAME commit instead rewrites
     the log base hive-partitioned by bucket (log_compact +
     partition_by in one manifest publish — no two-commit crash
     window): the base becomes the partition-prunable IVF segment of
     plans/ann.write_ivf_index, and the un-compacted tail stays
     bounded by the cadence.

``stream_vectors`` is the read view (partitioned base ∪ flat deltas,
bucket normalized to long); ``plans/ann.ann_topk`` over it equals the
batch-built index bit for bit (tested), with the base scan partition-
pruned by the probe set and the delta scans bounded by the cadence.

Contract: source vec_ids are unique (upstream assigns them like
discovery_seq); the stream does not deduplicate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from ..functions.vectors import lsh_bucket_col

VECTOR_DELTA_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
        StructField("arrival_seq", LongType(), False),
    ]
)

LOG = "ivf_vectors"
_META_BID = "ivf_last_bid"


def vector_delta_stream(spark: SparkSession, vec_dir: str) -> DataFrame:
    return spark.readStream.schema(VECTOR_DELTA_SCHEMA).parquet(vec_dir)


def stream_vectors(
    spark: SparkSession, store, log: str = LOG
) -> DataFrame:
    """The stream-built index as one DataFrame: compacted base
    (hive-partitioned by bucket — its scan partition-prunes under
    ann_topk's isin probe filter) unioned with the flat delta tail.
    The partition column comes back from directory inference as int;
    normalize to long so the union matches the delta schema."""
    m = store.manifest() or {}
    info = m.get("logs", {}).get(log)
    if not info:
        raise FileNotFoundError(f"no log table {log!r}")
    parts = []
    if info.get("base"):
        base = spark.read.parquet(info["base"])
        parts.append(base.withColumn("bucket", F.col("bucket").cast("long")))
    for d in info.get("deltas", []):
        parts.append(spark.read.parquet(d))
    return reduce(lambda a, b: a.unionByName(b), parts)


def start_vector_ingest(
    spark: SparkSession,
    vec_dir: str,
    store,
    ckpt_dir: str,
    n_planes: int = 8,
    compact_every: int = 4,
    log: str = LOG,
    available_now: bool = True,
):
    """Returns the StreamingQuery; availableNow=True drains a closed
    directory and stops (the tested mode)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        meta = (store.manifest() or {}).get("meta", {})
        last = meta.get(_META_BID)
        if last is not None and bid <= int(last):
            return  # at-least-once replay of an already-committed batch
        bucketed = batch_df.withColumn(
            "bucket", lsh_bucket_col(F.col("embedding"), n_planes)
        )
        if store.log_delta_count(log) + 1 >= compact_every:
            # fold the standing log AND this batch into one
            # bucket-partitioned base — a single atomic commit, so a
            # crash either keeps the old manifest (batch uncommitted,
            # will replay) or publishes the compacted one; there is no
            # state in between.
            try:
                standing = stream_vectors(spark, store, log)
            except FileNotFoundError:  # first batch, compact_every=1
                standing = None
            full = (
                standing.unionByName(bucketed)
                if standing is not None
                else bucketed
            )
            store.commit(
                bid,
                log_compact={log: full},
                partition_by={log: ["bucket"]},
                meta={_META_BID: bid, "ivf_n_planes": n_planes},
                carry_tables=True,
            )
        else:
            store.commit(
                bid,
                log_appends={log: bucketed},
                meta={_META_BID: bid, "ivf_n_planes": n_planes},
                carry_tables=True,
            )

    q = (
        vector_delta_stream(spark, vec_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt_dir)
    )
    if available_now:
        q = q.trigger(availableNow=True)
    return q.start()
