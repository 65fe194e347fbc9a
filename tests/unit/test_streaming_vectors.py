"""Streaming vector ingest + incremental IVF maintenance
(streaming/vector_stream.py): the stream-built index must equal the
batch-built plans/ann index bit for bit regardless of how the corpus
was flushed (availableNow == batch), compaction must leave a
partition-prunable base with a cadence-bounded delta tail in ONE
atomic commit, and a replayed committed batch must not double-ingest."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from web_crawler_search_engine_spark.plans import ann

COLS = "vec_id long, embedding array<float>, arrival_seq long"
SF = "/root/testdata/sf0.001"


def _rows(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return [
        (r["vec_id"], r["embedding"], r["vec_id"])
        for r in emb.select("vec_id", "embedding").collect()
    ]


def _run_stream(spark, tmp_path_factory, flushes, compact_every=4):
    from web_crawler_search_engine_spark.sources.checkpoints import (
        SnapshotStore,
    )
    from web_crawler_search_engine_spark.streaming.vector_stream import (
        start_vector_ingest,
    )

    drop = str(tmp_path_factory.mktemp("vecdrop"))
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("vecstore")))
    ckpt = str(tmp_path_factory.mktemp("vecckpt"))
    for flush in flushes:
        spark.createDataFrame(flush, COLS).coalesce(1).write.mode(
            "append"
        ).parquet(drop)
        q = start_vector_ingest(
            spark, drop, store, ckpt, compact_every=compact_every
        )
        q.awaitTermination(120)
    return drop, store, ckpt


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    rows = _rows(spark)
    # 3 flushes with compact_every=2: batch 1 compacts, batch 2 is a
    # delta on top of the partitioned base
    flushes = [rows[:20], rows[20:35], rows[35:]]
    return _rows(spark), _run_stream(
        spark, tmp_path_factory, flushes, compact_every=2
    )


def test_stream_equals_batch_index(spark, streamed, tmp_path_factory):
    from web_crawler_search_engine_spark.streaming.vector_stream import (
        stream_vectors,
    )

    rows, (_, store, _) = streamed
    got = stream_vectors(spark, store)
    assert got.count() == len(rows)

    # batch-built index over the same corpus
    path = str(tmp_path_factory.mktemp("ivfbatch"))
    corpus = spark.createDataFrame(rows, COLS).select("vec_id", "embedding")
    ann.write_ivf_index(corpus, path)
    batch_corpus, n_planes = ann.read_ivf_index(spark, path)

    queries = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got_topk = sorted(
        map(tuple, ann.ann_topk(got, queries, k=3).collect())
    )
    want_topk = sorted(
        map(tuple, ann.ann_topk(batch_corpus, queries, k=3).collect())
    )
    assert got_topk == want_topk


def test_compaction_layout_and_cadence(spark, streamed):
    rows, (_, store, _) = streamed
    m = store.manifest()
    info = m["logs"]["ivf_vectors"]
    # batch 1 (2nd delta) compacted; batch 2 appended one delta
    assert info["base"] is not None and len(info["deltas"]) == 1
    # the compacted base is hive-partitioned by bucket: searching the
    # stream view plans a PartitionFilters entry on it
    from web_crawler_search_engine_spark.streaming.vector_stream import (
        stream_vectors,
    )

    queries = (
        spark.createDataFrame(rows[:4], COLS)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    result = ann.ann_topk(stream_vectors(spark, store), queries, k=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        result.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan, plan


def test_replay_of_committed_batches_skipped(spark, streamed):
    """Re-running the drained stream from a FRESH checkpoint re-delivers
    every batch with already-committed ids; all must be skipped."""
    import tempfile

    from web_crawler_search_engine_spark.streaming.vector_stream import (
        start_vector_ingest,
        stream_vectors,
    )

    rows, (drop, store, _) = streamed
    before = stream_vectors(spark, store).count()
    with tempfile.TemporaryDirectory() as ckpt2:
        q = start_vector_ingest(spark, drop, store, ckpt2, compact_every=2)
        q.awaitTermination(120)
    assert stream_vectors(spark, store).count() == before == len(rows)
