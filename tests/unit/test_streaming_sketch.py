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


def _run_cms_stream(spark, tmp_path_factory, flushes):
    from web_crawler_search_engine_spark.sources.checkpoints import (
        SnapshotStore,
    )
    from web_crawler_search_engine_spark.streaming.sketch_stream import (
        start_cms_ingest,
    )

    drop = str(tmp_path_factory.mktemp("cmsdrop"))
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("cmsstore")))
    ckpt = str(tmp_path_factory.mktemp("cmsckpt"))
    for flush in flushes:
        spark.createDataFrame(flush, COLS).coalesce(1).write.mode(
            "append"
        ).parquet(drop)
        q = start_cms_ingest(spark, drop, store, ckpt)
        q.awaitTermination(120)
    return store


def test_cms_stream_equals_single_batch_and_never_undercounts(
    spark, tmp_path_factory
):
    from web_crawler_search_engine_spark.streaming.sketch_stream import (
        CMS_TABLE,
        frequency_estimate,
    )

    rows = _rows()
    split = _run_cms_stream(
        spark, tmp_path_factory, [rows[:20], rows[20:45], rows[45:]]
    )
    single = _run_cms_stream(spark, tmp_path_factory, [rows])

    def cnts(store):
        return {
            (r["row"], r["col"]): r["cnt"]
            for r in store.load(CMS_TABLE).collect()
        }

    # additive merge across 3 flushes == one shot (exactly-once sums)
    assert cnts(split) == cnts(single)
    toks = (
        spark.createDataFrame(rows, COLS)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    true_counts = {
        r["token"]: r["cnt"]
        for r in toks.groupBy("token").agg(F.count("*").alias("cnt")).collect()
    }
    # one-sided error: estimates never under-count; an unseen token's
    # estimate is pure collision mass — bounded by the total stream
    # (the 3x256 table is dense at 400 tokens, so it need not be 0)
    total = sum(true_counts.values())
    for t in list(true_counts)[:5]:
        est = frequency_estimate(spark, split, t)
        assert true_counts[t] <= est <= total
    assert 0 <= frequency_estimate(spark, split, "never-seen-token") <= total


def test_cms_replayed_batch_does_not_double_count(spark, tmp_path_factory):
    """The additive merge is NOT idempotent — this is the test that
    the batch marker, not luck, provides exactly-once."""
    from web_crawler_search_engine_spark.sources.checkpoints import (
        SnapshotStore,
    )
    from web_crawler_search_engine_spark.streaming.sketch_stream import (
        CMS_TABLE,
        start_cms_ingest,
    )

    rows = _rows()
    drop = str(tmp_path_factory.mktemp("cmsdrop2"))
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("cmsstore2")))
    spark.createDataFrame(rows, COLS).coalesce(1).write.mode(
        "append"
    ).parquet(drop)
    q = start_cms_ingest(
        spark, drop, store, str(tmp_path_factory.mktemp("cmsckpt2"))
    )
    q.awaitTermination(120)
    before = {
        (r["row"], r["col"]): r["cnt"]
        for r in store.load(CMS_TABLE).collect()
    }
    # fresh checkpoint: the file source re-delivers everything as
    # batch 0, already covered by the committed marker
    q2 = start_cms_ingest(
        spark, drop, store, str(tmp_path_factory.mktemp("cmsckpt3"))
    )
    q2.awaitTermination(120)
    after = {
        (r["row"], r["col"]): r["cnt"]
        for r in store.load(CMS_TABLE).collect()
    }
    assert after == before


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