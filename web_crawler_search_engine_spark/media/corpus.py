"""Deterministic synthetic audio/video corpus (seeded — no external
data, same pattern as sources/corpus.py generate_world).

Audio rows are sine bursts + uniform noise at varying frequency /
amplitude / length; video rows are moving-gradient frames + seeded
noise. Both carry their ground-truth feature values so catalog oracles
can embed them as literal VALUES (the q_image_dedup_decision pattern:
the generator is seeded, so the Spark UDF path and the DuckDB twin see
identical truth).
"""

from __future__ import annotations

import numpy as np

from . import codec


def audio_rows(n: int = 60, seed: int = 23) -> list[dict]:
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        rate = 8_000
        length = int(rng.randint(400, 4_000))
        freq = float(rng.uniform(50, 900))
        amp = float(rng.uniform(0.05, 0.9))
        t = np.arange(length, dtype=np.float64) / rate
        wave = amp * np.sin(2 * np.pi * freq * t)
        wave = wave + rng.uniform(-0.02, 0.02, size=length)
        samples = np.clip(np.round(wave * 32767), -32768, 32767).astype(np.int16)
        feats = codec.audio_features(samples, rate)
        rows.append(
            {
                "audio_id": f"au{i:05d}",
                "bytes": bytearray(codec.wav_encode(samples, rate)),
                "rate": rate,
                **feats,
            }
        )
    return rows


def video_rows(n: int = 24, seed: int = 29, every_k: int = 3) -> list[dict]:
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        nf = int(rng.randint(4, 13))
        w = h = 16
        base = rng.randint(0, 256, size=(h, w, 3))
        frames = np.stack(
            [
                np.clip(base + 9 * f + rng.randint(-6, 7, size=(h, w, 3)), 0, 255)
                for f in range(nf)
            ]
        ).astype(np.uint8)
        blob = codec.video_encode(frames)
        rows.append(
            {
                "video_id": f"vi{i:05d}",
                "bytes": bytearray(blob),
                "n_frames": nf,
                "w": w,
                "h": h,
                "samples": codec.sample_frames(bytes(blob), every_k),
            }
        )
    return rows
