"""From-spec baseline JPEG codec (images/jpeg.py, ITU-T T.81).

The north_rule's per-row image invariant is "decoded-pixel allclose
(PSNR>=40dB for lossy formats)"; these tests pin that the `jpeg`
format is a real interchange-format JPEG (marker structure, standard
tables, Huffman entropy coding) AND genuinely lossy (finite PSNR on
noise images), so the invariant has teeth in both directions.
"""

import numpy as np
import pytest

from web_crawler_search_engine_spark.images import codec, jpeg


def _noise(shape, seed=0):
    return (
        np.random.RandomState(seed)
        .randint(0, 256, (*shape, 3))
        .astype(np.uint8)
    )


@pytest.mark.parametrize("shape", [(8, 8), (32, 32), (32, 64), (64, 32), (64, 64)])
def test_roundtrip_psnr_at_least_40_and_finite_on_noise(shape):
    img = _noise(shape, seed=sum(shape))
    out = jpeg.jpeg_decode(jpeg.jpeg_encode(img))
    p = codec.psnr(img, out)
    assert 40.0 <= p < float("inf"), p


def test_structured_image_higher_fidelity_than_noise():
    g = np.indices((64, 64)).sum(0)
    img = np.stack([g % 256, (g * 3) % 256, (255 - g) % 256], -1).astype(
        np.uint8
    )
    p_grad = codec.psnr(img, jpeg.jpeg_decode(jpeg.jpeg_encode(img)))
    p_noise = codec.psnr(
        _noise((64, 64)), jpeg.jpeg_decode(jpeg.jpeg_encode(_noise((64, 64))))
    )
    assert p_grad > p_noise  # transform coding concentrates smooth energy


def test_marker_structure_is_interchange_format():
    blob = jpeg.jpeg_encode(_noise((32, 32)))
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    # JFIF APP0 right after SOI, per the JFIF spec
    assert blob[2:4] == b"\xff\xe0" and blob[6:11] == b"JFIF\x00"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in blob
    assert blob.count(b"\xff\xc4") >= 4  # 2 DC + 2 AC Huffman tables
    assert b"\xff\xc2" not in blob[:200]  # baseline, not progressive


def test_sof0_records_dimensions():
    import struct

    blob = jpeg.jpeg_encode(_noise((32, 64)))
    at = blob.find(b"\xff\xc0")
    prec, h, w, nc = struct.unpack(">BHHB", blob[at + 4 : at + 10])
    assert (prec, h, w, nc) == (8, 32, 64, 3)


def test_entropy_segment_is_byte_stuffed():
    blob = jpeg.jpeg_encode(_noise((64, 64), seed=7))
    sos = blob.find(b"\xff\xda")
    scan = blob[sos + 14 : -2]
    i = 0
    while True:
        i = scan.find(b"\xff", i)
        if i < 0 or i + 1 >= len(scan):
            break
        assert scan[i + 1] == 0x00, "unstuffed 0xFF inside scan data"
        i += 2


def test_quality_dial_trades_size_for_fidelity():
    img = _noise((64, 64), seed=3)
    sizes, psnrs = [], []
    for q in (80, 95, 100):
        blob = jpeg.jpeg_encode(img, q)
        sizes.append(len(blob))
        psnrs.append(codec.psnr(img, jpeg.jpeg_decode(blob)))
    assert sizes == sorted(sizes) and psnrs == sorted(psnrs)


def test_deterministic_encoding():
    img = _noise((32, 32), seed=9)
    assert jpeg.jpeg_encode(img) == jpeg.jpeg_encode(img)


def test_decode_rejects_non_jpeg_and_truncation():
    with pytest.raises(ValueError):
        jpeg.jpeg_decode(b"\x89PNG\r\n\x1a\n....")
    blob = jpeg.jpeg_encode(_noise((32, 32)))
    with pytest.raises(ValueError):
        jpeg.jpeg_decode(blob[:-40])  # EOI gone -> truncated scan


def test_zigzag_matches_spec_table():
    # T.81 Figure A.6 — first/last rows of the canonical order.
    zz = jpeg._ZIGZAG
    assert list(zz[:8]) == [0, 1, 8, 16, 9, 2, 3, 10]
    assert list(zz[-8:]) == [53, 60, 61, 54, 47, 55, 62, 63]
    assert sorted(zz) == list(range(64))


def test_codec_dispatch_routes_jpeg_here():
    img = _noise((32, 32), seed=5)
    blob = codec.encode(img, "jpeg")
    assert blob[:2] == b"\xff\xd8"
    p = codec.psnr(img, codec.decode(blob, "jpeg"))
    assert 40.0 <= p < float("inf")
    # legacy transform codec still available as its own format
    dct = codec.encode(img, "dct")
    assert dct[:8] == b"WCSEDCT1"
    assert codec.psnr(img, codec.decode(dct, "dct")) >= 40.0


def test_dc_prediction_across_blocks():
    # A hard left-right luminance step exercises DC diffs of both signs.
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, 8:] = 255
    out = jpeg.jpeg_decode(jpeg.jpeg_encode(img))
    assert codec.psnr(img, out) >= 40.0


# ----------------------------------------------------------- properties

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    by=st.integers(min_value=1, max_value=4),
    bx=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    quality=st.integers(min_value=98, max_value=100),
)
def test_property_roundtrip_invariant(by, bx, seed, quality):
    """For any block-aligned dims and seed, at the default quality or
    above (the >=40 dB floor is a property of DEFAULT_QUALITY=98 —
    q96 measures ~37.9 dB on noise): decode of encode keeps shape,
    dtype, and the invariant; below q99 the stream stays genuinely
    lossy on noise input."""
    img = _noise((8 * by, 8 * bx), seed=seed)
    blob = jpeg.jpeg_encode(img, quality)
    out = jpeg.jpeg_decode(blob)
    assert out.shape == img.shape and out.dtype == np.uint8
    p = codec.psnr(img, out)
    assert p >= 40.0
    if quality < 99 and min(by, bx) >= 2:
        assert p < float("inf")


@settings(max_examples=25, deadline=None)
@given(
    cut=st.integers(min_value=2, max_value=4000),
    flip=st.integers(min_value=2, max_value=4000),
    val=st.integers(min_value=0, max_value=255),
)
def test_property_corruption_never_hangs_or_crashes(cut, flip, val):
    """Arbitrary truncation or byte-flips must yield a loud codec
    error (or, for flips that only touch coefficients, a decodable
    image) — never a hang, wrong-shape array, or non-codec exception."""
    blob = jpeg.jpeg_encode(_noise((32, 32), seed=1))
    for attack in (blob[: cut % len(blob)],
                   blob[: flip % len(blob)] + bytes([val]) + blob[flip % len(blob) + 1:]):
        try:
            out = jpeg.jpeg_decode(attack)
        except (ValueError, NotImplementedError, struct.error):
            continue
        assert isinstance(out, np.ndarray) and out.dtype == np.uint8


import struct  # noqa: E402  (used by the corruption property)
