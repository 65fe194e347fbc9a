"""Image codec invariants: PNG roundtrip is exact; the DCT lossy codec
has GENUINE, bounded loss (40 <= PSNR < inf); phash is deterministic
and dup-preserving, and drifts at most a few bits under the loss."""

import numpy as np
import pytest

from web_crawler_search_engine_spark.images import codec


def _img(seed, h=32, w=32):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_png_roundtrip_exact():
    for seed, (h, w) in [(1, (32, 32)), (2, (64, 32)), (3, (128, 64))]:
        img = _img(seed, h, w)
        out = codec.png_decode(codec.png_encode(img))
        assert np.array_equal(img, out)


def test_lossy_roundtrip_psnr_at_least_40_and_finite():
    for seed in range(5):
        img = _img(seed, 64, 64)
        out = codec.lossy_decode(codec.lossy_encode(img))
        p = codec.psnr(img, out)
        # genuine loss: the invariant has teeth now — an identity
        # codec (r2's stub) would fail the finiteness half
        assert 40.0 <= p < float("inf"), p
        assert not np.array_equal(img, out)


def test_phash_deterministic_and_distinct():
    a, b = _img(1), _img(2)
    assert codec.phash64(a) == codec.phash64(a)
    assert codec.phash64(a) != codec.phash64(b)
    assert isinstance(codec.phash64(a), int)
    # int64 range
    assert -(2**63) <= codec.phash64(a) < 2**63


def test_phash_stable_under_lossy():
    # a PERCEPTUAL hash must survive mild codec noise: allow a few
    # flipped bits (near-median DCT signs), never a different hash.
    # Pure-noise images are the worst case; measured drift is <= 2
    # bits over 120 seeds. (Dedup correctness never depends on this:
    # the corpus stores phash-of-decoded, so stored == recomputed
    # exactly — pinned by test_phash_dedup_matches_ground_truth.)
    for seed in (3, 7, 11, 19):
        img = _img(seed, 64, 64)
        out = codec.lossy_decode(codec.lossy_encode(img))
        drift = bin(
            (codec.phash64(img) ^ codec.phash64(out)) & (2**64 - 1)
        ).count("1")
        assert drift <= 3, (seed, drift)


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        codec.encode(_img(1), "webp")


def test_world_generator_deterministic_and_linked():
    from web_crawler_search_engine_spark.sources.corpus import generate_world

    w1 = generate_world(n=60, hosts=4, seed=42)
    w2 = generate_world(n=60, hosts=4, seed=42)
    assert [r["url"] for r in w1.rows] == [r["url"] for r in w2.rows]
    assert [r["content"] for r in w1.rows] == [r["content"] for r in w2.rows]
    assert [r["phash"] for r in w1.rows] == [r["phash"] for r in w2.rows]
    # dups mirror content + phash
    dups = [r for r in w1.rows if r["dup_of"]]
    assert dups, "expected some duplicate rows"
    by_url = w1.by_url()
    for d in dups:
        assert d["content"] == by_url[d["dup_of"]]["content"]
        assert d["phash"] == by_url[d["dup_of"]]["phash"]
    # decode invariant holds for every row
    for r in w1.rows[:20]:
        img = codec.decode(bytes(r["bytes"]), r["fmt"])
        assert img.shape == (r["h"], r["w"], 3)
        assert codec.phash64(img) == r["phash"]
