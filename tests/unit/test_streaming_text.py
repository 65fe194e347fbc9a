"""Streaming text near-dup ingest: availableNow over a drop directory
must equal the one-shot decision on the union of flushes (the
band-commit-all rule makes batching invisible), and near-dup planted
clones must be dropped across batch boundaries."""

from pyspark.sql import functions as F

COLS = "doc_id long, text string, arrival_seq long"

# 40 tokens: long enough that a one-word edit leaves >=1 of the 4
# LSH bands intact (verified: the "epsilon" variant shares exactly 1)
_BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lam mu nu xi omicron pi rho sigma tau upsilon "
    "phi chi psi omega one two three four five six "
    "seven eight nine ten eleven twelve red green blue gold"
)


def _rows():
    # doc0: base text. doc1: exact clone (same shingles => same bands).
    # doc2: near-clone (one word changed mid-text => most shingles
    # shared => shares >=1 band with doc0). doc3: unrelated. doc4:
    # too short for shingles (never dropped, never blocks).
    return [
        (0, _BASE, 0),
        (1, _BASE, 1),
        (2, _BASE.replace("epsilon", "EPSILON"), 2),
        (3, "cat dog fox owl elk bee ant yak ram hen sow ewe", 3),
        (4, "tiny doc", 4),
    ]


def _run_stream(spark, tmp_path_factory, flushes):
    from web_crawler_search_engine_spark.sources.checkpoints import (
        SnapshotStore,
    )
    from web_crawler_search_engine_spark.streaming.text_stream import (
        start_text_ingest,
    )

    drop = str(tmp_path_factory.mktemp("txtdrop"))
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("txtstore")))
    ckpt = str(tmp_path_factory.mktemp("txtckpt"))
    for flush in flushes:
        spark.createDataFrame(flush, COLS).coalesce(1).write.mode(
            "append"
        ).parquet(drop)
        q = start_text_ingest(spark, drop, store, ckpt)
        q.awaitTermination(120)
    return store


def test_near_dup_dropped_across_batches(spark, tmp_path_factory):
    rows = _rows()
    store = _run_stream(spark, tmp_path_factory, [rows[:2], rows[2:]])
    kept = {r["doc_id"] for r in store.load_log("stream_docs").collect()}
    # doc1 exact clone (in-batch), doc2 near-clone (cross-batch vs the
    # committed bands of batch 1) both dropped; doc3/doc4 kept
    assert kept == {0, 3, 4}


def test_stream_equals_single_batch(spark, tmp_path_factory):
    rows = _rows()
    split = _run_stream(
        spark, tmp_path_factory, [rows[:1], rows[1:3], rows[3:]]
    )
    single = _run_stream(spark, tmp_path_factory, [rows])
    a = {r["doc_id"] for r in split.load_log("stream_docs").collect()}
    b = {r["doc_id"] for r in single.load_log("stream_docs").collect()}
    assert a == b
    ba = {r["band"] for r in split.load_log("band_seen").collect()}
    bb = {r["band"] for r in single.load_log("band_seen").collect()}
    assert ba == bb


def test_band_scheme_matches_batch_catalog(spark, tmp_path_factory):
    """The stream's bands must be the batch query's bands — one shared
    near-dup definition engine-wide (doc pairs the batch LSH blocks on
    collide in the stream's band space too)."""
    from web_crawler_search_engine_spark.streaming.text_stream import (
        doc_bands,
    )

    rows = _rows()
    df = spark.createDataFrame(rows, COLS)
    bands = doc_bands(df)
    shared = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .collect()
    )
    pairs = {(r["x"], r["y"]) for r in shared}
    assert (0, 1) in pairs  # exact clone: all bands shared
    assert (0, 2) in pairs or (1, 2) in pairs  # near-clone: >=1 band
    assert all(3 not in p and 4 not in p for p in pairs)
