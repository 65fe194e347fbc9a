"""Streaming image ingest (X3 across micro-batches): availableNow over
a drop directory must equal batch phash_dedup on the union of flushes,
first-arrival-wins across batches, with dropped duplicates' captions
preserved in the carry log."""


COLS = "image_id string, url string, phash long, caption string, arrival_seq long"


def _row(i, phash, seq):
    return (
        f"img{i}",
        f"https://h0.example.com/img{i}",
        phash,
        f"cap {i}",
        seq,
    )


def test_image_ingest_stream_equals_batch_dedup(spark, tmp_path_factory):
    from web_crawler_search_engine_spark.sources.checkpoints import (
        SnapshotStore,
    )
    from web_crawler_search_engine_spark.streaming import start_image_ingest

    drop = str(tmp_path_factory.mktemp("imgdrop"))
    # flush1: phash 100 twice (in-batch dup), 200 once
    flush1 = [_row(0, 100, 0), _row(1, 100, 1), _row(2, 200, 2)]
    # flush2: phash 200 again (cross-batch dup), 300 fresh
    flush2 = [_row(3, 200, 3), _row(4, 300, 4)]
    spark.createDataFrame(flush1, COLS).coalesce(1).write.mode(
        "append"
    ).parquet(drop)

    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("imgstore")))
    ckpt = str(tmp_path_factory.mktemp("imgckpt"))
    q = start_image_ingest(spark, drop, store, ckpt)
    q.awaitTermination(120)
    spark.createDataFrame(flush2, COLS).coalesce(1).write.mode(
        "append"
    ).parquet(drop)
    q2 = start_image_ingest(spark, drop, store, ckpt)
    q2.awaitTermination(120)

    kept = {
        (r["image_id"], r["phash"])
        for r in store.load_log("stream_images").collect()
    }
    # first arrival per phash across the whole stream
    assert kept == {("img0", 100), ("img2", 200), ("img4", 300)}
    seen = {r["phash"] for r in store.load_log("image_seen").collect()}
    assert seen == {100, 200, 300}
    carry = {
        (r["phash"], r["image_id"], r["caption"])
        for r in store.load_log("stream_carry").collect()
    }
    # in-batch dup img1 and cross-batch dup img3 both carried
    assert carry == {(100, "img1", "cap 1"), (200, "img3", "cap 3")}
