"""Image codec invariants: PNG roundtrip is exact; the fake-lossy stub
keeps PSNR >= 40 dB; phash is deterministic and dup-preserving."""

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


def test_lossy_roundtrip_psnr_at_least_40():
    for seed in range(5):
        img = _img(seed, 64, 64)
        out = codec.lossy_decode(codec.lossy_encode(img))
        p = codec.psnr(img, out)
        assert p >= 40.0, p
        assert not np.array_equal(img, out)  # genuinely lossy


def test_phash_deterministic_and_distinct():
    a, b = _img(1), _img(2)
    assert codec.phash64(a) == codec.phash64(a)
    assert codec.phash64(a) != codec.phash64(b)
    assert isinstance(codec.phash64(a), int)
    # int64 range
    assert -(2**63) <= codec.phash64(a) < 2**63


def test_phash_stable_under_lossy():
    img = _img(7, 64, 64)
    out = codec.lossy_decode(codec.lossy_encode(img))
    # quantization noise must not flip the perceptual hash
    assert codec.phash64(img) == codec.phash64(out)


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
