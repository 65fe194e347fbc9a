"""Streaming HLL registers: availableNow over N flushes must equal
the one-shot registers over the union (max is associative), the
estimate must match the closed-form recompute, and a replayed batch
must be a no-op (exactly-once)."""

import math

from pyspark.sql import functions as F

from web_crawler_search_engine_spark.functions.sketches import (
    HLL_M,
    hll_estimate,
    hll_registers,
)
from web_crawler_search_engine_spark.streaming.sketch_stream import (
    REGS_TABLE,
    distinct_estimate,
    start_sketch_ingest,
)

COLS = "doc_id long, text string"

_WORDS = [f"w{i}" for i in range(400)]


def _rows():
    # 60 docs, each 20 words drawn deterministically from a 400-word
    # vocab with heavy reuse — exercises both dup-idempotence and a
    # registers table well inside the linear-counting regime
    return [
        (
            d,
            " ".join(_WORDS[(d * 7 + k * 13) % 400] for k in range(20)),
        )
        for d in range(60)
    ]


def _run_stream(spark, tmp_path_factory, flushes):
    from web_crawler_search_engine_spark.sources.checkpoints import (
        SnapshotStore,
    )

    drop = str(tmp_path_factory.mktemp("skdrop"))
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("skstore")))
    ckpt = str(tmp_path_factory.mktemp("skckpt"))
    for flush in flushes:
        spark.createDataFrame(flush, COLS).coalesce(1).write.mode(
            "append"
        ).parquet(drop)
        q = start_sketch_ingest(spark, drop, store, ckpt)
        q.awaitTermination(120)
    return store


def _regs_of(store):
    return {
        r["bucket"]: r["m_j"] for r in store.load(REGS_TABLE).collect()
    }


def test_stream_equals_single_batch_registers(spark, tmp_path_factory):
    rows = _rows()
    split = _run_stream(
        spark, tmp_path_factory, [rows[:10], rows[10:35], rows[35:]]
    )
    single = _run_stream(spark, tmp_path_factory, [rows])
    assert _regs_of(split) == _regs_of(single)
    assert distinct_estimate(split) == distinct_estimate(single)


def test_registers_match_batch_helper_and_estimate_sane(
    spark, tmp_path_factory
):
    rows = _rows()
    store = _run_stream(spark, tmp_path_factory, [rows[:30], rows[30:]])
    toks = (
        spark.createDataFrame(rows, COLS)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    want = {
        r["bucket"]: r["m_j"]
        for r in hll_registers(toks, "token").collect()
    }
    got = _regs_of(store)
    assert got == want
    est = distinct_estimate(store)
    n_exact = toks.distinct().count()
    # linear-counting regime at n≈400, m=512: tight estimate
    assert abs(est - n_exact) / n_exact < 0.15
    assert est == hll_estimate(sorted(got.items()))
    assert math.isfinite(est) and 0 < est < HLL_M * 60


def test_replayed_batch_is_noop(spark, tmp_path_factory):
    """At-least-once replay: a FRESH stream checkpoint over the same
    drop directory re-delivers everything as batch 0 — which the
    store's batch marker already covers, so the commit is skipped and
    the registers (and manifest round) are untouched."""
    rows = _rows()
    drop = str(tmp_path_factory.mktemp("skdrop2"))
    from web_crawler_search_engine_spark.sources.checkpoints import (
        SnapshotStore,
    )

    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("skstore2")))
    spark.createDataFrame(rows, COLS).coalesce(1).write.mode(
        "append"
    ).parquet(drop)
    q = start_sketch_ingest(
        spark, drop, store, str(tmp_path_factory.mktemp("skckpt2"))
    )
    q.awaitTermination(120)
    before = _regs_of(store)
    round_before = store.latest_round()
    assert 0 in (store.manifest() or {})["meta"]["hll"]["batches"]
    # replay with a brand-new checkpoint: same files, same batch id 0
    q2 = start_sketch_ingest(
        spark, drop, store, str(tmp_path_factory.mktemp("skckpt3"))
    )
    q2.awaitTermination(120)
    assert _regs_of(store) == before
    assert store.latest_round() == round_before