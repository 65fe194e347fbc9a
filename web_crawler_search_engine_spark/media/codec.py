"""Audio/video codecs for multimodal binary columns — pure stdlib+numpy.

The graft treats audio/video as opaque ``binary`` columns with typed
metadata, decoded inside Arrow-batched UDFs (media/udfs.py), mirroring
the image path (images/codec.py). This container has no soundfile /
ffmpeg, so:

  * audio: a REAL minimal WAV codec — RIFF/WAVE, PCM16 mono, built on
    the public RIFF spec with stdlib ``struct``. Lossless: the int16
    sample vector round-trips bit-exactly, so every feature computed
    after decode provably equals the generator's ground truth.
  * video: a deterministic frame container (magic + (n, w, h) header +
    zlib-compressed concatenated RGB24 frames). Not a real inter-frame
    codec — the point is the Spark-side plumbing (binary column in,
    exploded frame rows out, every-k temporal sampling), which is
    identical to what an ffmpeg-backed decode would feed. Swap
    ``video_decode`` for a real demuxer when available.

Features are plain numpy (RMS energy, zero-crossing count, per-frame
mean luma) — the audio/text-quality analog of the image path's phash.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_WAV_RATE_DEFAULT = 8_000
_VIDEO_MARK = b"WCSEV1\x00\x00"


# -- audio: RIFF/WAVE PCM16 mono (public spec) --------------------------


def wav_encode(samples: np.ndarray, rate: int = _WAV_RATE_DEFAULT) -> bytes:
    """Minimal canonical WAV: RIFF header + fmt chunk (PCM, mono,
    16-bit) + data chunk."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """Parse the RIFF chunk list; returns (int16 samples, sample rate).
    Accepts any chunk ordering/extra chunks per the spec."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, end = 12, 8 + struct.unpack("<I", blob[4:8])[0]
    rate, data = None, None
    while pos + 8 <= end:
        tag = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        payload = blob[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif tag == b"data":
            data = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return np.frombuffer(data, dtype="<i2"), rate


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """The per-row audio invariant set: sample count, exact integer
    duration in ms, RMS energy (3 decimals), zero-crossing count."""
    x = samples.astype(np.float64)
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return {
        "n_samples": int(samples.size),
        "duration_ms": int(samples.size * 1000) // rate,
        "rms": round(float(np.sqrt(np.mean(x * x))), 3) if samples.size else 0.0,
        "zero_crossings": zc,
    }


# -- video: parsed frame container --------------------------------------


def video_encode(frames: np.ndarray) -> bytes:
    """frames: (n, h, w, 3) uint8."""
    assert frames.dtype == np.uint8 and frames.ndim == 4 and frames.shape[3] == 3
    n, h, w = frames.shape[:3]
    return (
        _VIDEO_MARK
        + struct.pack("<HHH", n, w, h)
        + zlib.compress(frames.tobytes(), 6)
    )


def video_decode(blob: bytes) -> np.ndarray:
    if blob[: len(_VIDEO_MARK)] != _VIDEO_MARK:
        raise ValueError("not a video container blob")
    n, w, h = struct.unpack("<HHH", blob[len(_VIDEO_MARK) : len(_VIDEO_MARK) + 6])
    raw = zlib.decompress(blob[len(_VIDEO_MARK) + 6 :])
    return np.frombuffer(raw, dtype=np.uint8).reshape(n, h, w, 3)


def frame_mean_luma_milli(frame: np.ndarray) -> int:
    """Mean Rec.601 luma of one RGB frame, in exact integer
    milli-units (0..255000) — integer output keeps the value
    bit-identical across engines with no float rounding contract."""
    f = frame.astype(np.int64)
    # 1000 * (0.299 R + 0.587 G + 0.114 B) with integer weights
    luma_milli = 299 * f[..., 0] + 587 * f[..., 1] + 114 * f[..., 2]
    return int(luma_milli.sum() // f[..., 0].size)


def sample_frames(blob: bytes, every_k: int) -> list[tuple[int, int]]:
    """Temporal sampling: frames 0, k, 2k, ... -> (frame_idx,
    mean_luma_milli). The decode is per-video; a real pipeline shards
    videos across partitions and samples inside the Arrow batch."""
    frames = video_decode(blob)
    return [
        (i, frame_mean_luma_milli(frames[i]))
        for i in range(0, frames.shape[0], every_k)
    ]
