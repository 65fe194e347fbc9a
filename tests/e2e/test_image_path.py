"""Image payload path (SURVEY §7.4): U7 invariants over a crawled
corpus, X3 phash dedup vs generator ground truth, feature/resize
plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_crawler_search_engine_spark.images import codec, udfs
from web_crawler_search_engine_spark.sources.corpus import corpus_df, generate_world


@pytest.fixture(scope="module")
def world():
    return generate_world(n=80, hosts=4, seed=7, with_images=True)


@pytest.fixture(scope="module")
def cdf(spark, world):
    return corpus_df(spark, world).persist()


def test_decode_verify_invariants(cdf):
    res = cdf.select(
        "image_id",
        "fmt",
        udfs.decode_verify("bytes", "fmt", "w", "h", "phash").alias("v"),
    ).select("image_id", "fmt", "v.*")
    rows = res.collect()
    assert rows
    for r in rows:
        assert r["decode_ok"], r["image_id"]
        assert r["dims_ok"], r["image_id"]
        assert r["phash_match"], r["image_id"]
        # codec idempotence: exact for png; (min'd to 99.0 for inf)
        assert r["requant_psnr"] >= 40.0, (r["image_id"], r["requant_psnr"])


def test_psnr_vs_original_pixels(world):
    """decoded-pixel allclose invariant vs the generator's ground
    truth: exact for png; 40 <= PSNR < inf for the lossy path (the
    finiteness half proves the codec genuinely loses information —
    r2's idempotent stub could never fail the invariant)."""
    rng = np.random.RandomState(3)
    for _ in range(10):
        img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
        png = codec.decode(codec.encode(img, "png"), "png")
        assert np.array_equal(img, png)
        p = codec.psnr(img, codec.decode(codec.encode(img, "jpeg"), "jpeg"))
        assert 40.0 <= p < float("inf"), p


def test_caption_carry_through_exact(spark, cdf, world):
    """Caption equality vs the reference pipeline: the fetch join must
    carry the caption column byte-for-byte."""
    fetched = cdf.select("url", "caption")
    want = {r["url"]: r["caption"] for r in world.rows}
    got = {r["url"]: r["caption"] for r in fetched.collect()}
    assert got == want


def test_phash_dedup_matches_ground_truth(cdf, world):
    df = cdf.withColumn("phash2", udfs.phash_of("bytes", "fmt"))
    # recomputed phash equals the stored column everywhere
    assert df.filter(F.col("phash2") != F.col("phash")).count() == 0
    survivors, dups = udfs.phash_dedup(df, order_col="image_id")
    dup_ids = {r["image_id"] for r in dups.select("image_id").collect()}
    truth_dups = {r["image_id"] for r in world.rows if r["dup_of"]}
    # ground-truth dups have an earlier identical image, so dedup must
    # drop them (unless two distinct images collide on phash — the
    # generator's random noise makes that measure-zero at this size)
    assert truth_dups, "fixture should contain dups"
    assert truth_dups <= dup_ids
    # anything else flagged must genuinely share a phash with an earlier row
    by_id = {r["image_id"]: r for r in world.rows}
    for d in dup_ids - truth_dups:
        ph = by_id[d]["phash"]
        earlier = [r for r in world.rows if r["phash"] == ph and r["image_id"] < d]
        assert earlier, d


def test_image_features_shape(cdf):
    feats = cdf.select(udfs.image_features("bytes", "fmt").alias("f")).first()["f"]
    assert len(feats) == 16 * 16 + 3
    assert all(0.0 <= x <= 1.0 for x in feats)


def test_resize_images_plumbing(cdf):
    small = udfs.resize_images(cdf.limit(8), out_dim=16)
    rows = small.select("bytes", "fmt", "w", "h").collect()
    for r in rows:
        assert r["fmt"] == "png" and r["w"] == 16 and r["h"] == 16
        img = codec.png_decode(bytes(r["bytes"]))
        assert img.shape == (16, 16, 3)
