"""Audio/video codec + UDF plumbing invariants: WAV round-trips
bit-exactly (lossless, so features-after-decode == ground truth by
necessity), the video container round-trips frame-exactly, temporal
sampling picks exactly frames 0, k, 2k, ..., and the Spark-side Arrow
plumbing produces the generator's truth."""

import numpy as np
import pytest

from web_crawler_search_engine_spark.media import codec
from web_crawler_search_engine_spark.media.corpus import audio_rows, video_rows


def test_wav_roundtrip_bit_exact():
    rng = np.random.RandomState(5)
    for n in (1, 7, 4000):
        samples = rng.randint(-32768, 32768, size=n).astype(np.int16)
        out, rate = codec.wav_decode(codec.wav_encode(samples, 8000))
        assert rate == 8000
        assert np.array_equal(samples, out)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        codec.wav_decode(b"RIFFxxxxJUNK" + b"\x00" * 20)
    with pytest.raises(ValueError):
        codec.wav_decode(b"\x89PNG" + b"\x00" * 40)


def test_audio_features_ground_truth():
    # duration is exact integer math; zero crossings counted on signbit
    samples = np.array([100, -100, 50, 50, -1, 0, 3], dtype=np.int16)
    f = codec.audio_features(samples, 1000)
    assert f["n_samples"] == 7
    assert f["duration_ms"] == 7
    assert f["zero_crossings"] == 4  # +->-, -->+, +->-, -->+ (0 is +)


def test_video_roundtrip_and_sampling():
    rng = np.random.RandomState(9)
    frames = rng.randint(0, 256, size=(7, 8, 8, 3)).astype(np.uint8)
    blob = codec.video_encode(frames)
    assert np.array_equal(codec.video_decode(blob), frames)
    s = codec.sample_frames(blob, 3)
    assert [i for i, _ in s] == [0, 3, 6]
    # integer luma: recompute one frame independently
    f0 = frames[0].astype(np.int64)
    want = int(
        (299 * f0[..., 0] + 587 * f0[..., 1] + 114 * f0[..., 2]).sum() // 64
    )
    assert s[0][1] == want


def test_corpus_deterministic():
    a1, a2 = audio_rows(n=5), audio_rows(n=5)
    assert [r["rms"] for r in a1] == [r["rms"] for r in a2]
    v1, v2 = video_rows(n=3), video_rows(n=3)
    assert [bytes(r["bytes"]) for r in v1] == [bytes(r["bytes"]) for r in v2]


def test_spark_media_plumbing(spark):
    """Arrow batch path end-to-end: UDF features == generator truth,
    mapInPandas frame explode == generator samples."""
    from pyspark.sql import functions as F

    from web_crawler_search_engine_spark.media.udfs import (
        audio_feature_udf,
        sample_video_frames,
    )

    rows = audio_rows(n=8)
    df = spark.createDataFrame(
        [(r["audio_id"], bytes(r["bytes"])) for r in rows],
        "audio_id string, bytes binary",
    )
    got = {
        r["audio_id"]: r
        for r in df.select(
            "audio_id", audio_feature_udf(F.col("bytes")).alias("f")
        )
        .select("audio_id", "f.*")
        .collect()
    }
    for r in rows:
        g = got[r["audio_id"]]
        assert g["n_samples"] == r["n_samples"]
        assert g["duration_ms"] == r["duration_ms"]
        assert g["rms"] == pytest.approx(r["rms"], abs=1e-9)
        assert g["zero_crossings"] == r["zero_crossings"]

    vrows = video_rows(n=4)
    vdf = spark.createDataFrame(
        [(r["video_id"], bytes(r["bytes"])) for r in vrows],
        "video_id string, bytes binary",
    )
    sampled = sample_video_frames(vdf, every_k=3).collect()
    got_v = {(r["video_id"], r["frame_idx"]): r["mean_luma_milli"] for r in sampled}
    want_v = {
        (r["video_id"], i): luma for r in vrows for i, luma in r["samples"]
    }
    assert got_v == want_v

    # null blob degrades to a null feature row / zero frames, not a crash
    null_df = spark.createDataFrame(
        [("x", None)], "audio_id string, bytes binary"
    )
    row = (
        null_df.select(audio_feature_udf(F.col("bytes")).alias("f"))
        .select("f.*")
        .collect()[0]
    )
    assert row["n_samples"] is None
