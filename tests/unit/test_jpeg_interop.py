"""Cross-validation of the from-spec JPEG codec against Pillow.

This container has no PIL/libjpeg, so these tests SKIP here — they
exist so that any environment that does have Pillow immediately
cross-checks the T.81 implementation against an independent decoder:
a stream our encoder emits must decode in Pillow to the same pixels
(within the codec's own loss bound), and a baseline stream Pillow
emits must decode here.
"""

import numpy as np
import pytest

PIL_Image = pytest.importorskip("PIL.Image", reason="Pillow not installed")

import io  # noqa: E402

from web_crawler_search_engine_spark.images import codec, jpeg  # noqa: E402


def _noise(shape, seed=0):
    return (
        np.random.RandomState(seed)
        .randint(0, 256, (*shape, 3))
        .astype(np.uint8)
    )


def test_pillow_decodes_our_stream_to_matching_pixels():
    img = _noise((64, 64), seed=1)
    blob = jpeg.jpeg_encode(img)
    theirs = np.asarray(PIL_Image.open(io.BytesIO(blob)).convert("RGB"))
    ours = jpeg.jpeg_decode(blob)
    # Two conforming decoders of one stream may differ by IDCT
    # rounding only — pixels must agree within ±1 almost everywhere.
    assert theirs.shape == ours.shape
    diff = np.abs(theirs.astype(int) - ours.astype(int))
    assert np.mean(diff <= 1) > 0.99
    assert codec.psnr(img, theirs) >= 40.0


def test_we_decode_a_pillow_baseline_stream():
    img = _noise((64, 64), seed=2)
    buf = io.BytesIO()
    PIL_Image.fromarray(img).save(
        buf, format="JPEG", quality=98, subsampling=0  # baseline 4:4:4
    )
    ours = jpeg.jpeg_decode(buf.getvalue())
    theirs = np.asarray(PIL_Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert codec.psnr(theirs, ours) >= 40.0
