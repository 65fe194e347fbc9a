"""Arrow-vectorized audio/video UDFs — the multimodal-column plumbing
for non-image payloads, mirroring images/udfs.py: binary column in,
typed struct / exploded rows out, batch-shaped so partitioning the
media table is the only scale knob (each Arrow batch decodes
independently; no driver-side work, no per-row Python UDFs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from . import codec

AUDIO_SCHEMA = StructType(
    [
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("zero_crossings", LongType(), True),
    ]
)


@F.pandas_udf(AUDIO_SCHEMA)
def audio_feature_udf(blob: pd.Series) -> pd.DataFrame:
    """Decode WAV + extract the per-row feature set. None in, None row
    out (a corrupt blob also degrades to a null row rather than
    failing the batch)."""
    rows = []
    for b in blob:
        if b is None:
            rows.append((None, None, None, None))
            continue
        try:
            samples, rate = codec.wav_decode(bytes(b))
        except Exception:
            rows.append((None, None, None, None))
            continue
        f = codec.audio_features(samples, rate)
        rows.append(
            (f["n_samples"], f["duration_ms"], f["rms"], f["zero_crossings"])
        )
    return pd.DataFrame(
        rows, columns=["n_samples", "duration_ms", "rms", "zero_crossings"]
    )


def sample_video_frames(df, every_k: int = 3, id_col: str = "video_id",
                        blob_col: str = "bytes"):
    """mapInPandas temporal sampling: one input row per video, one
    output row per sampled frame (frames 0, k, 2k, ...), with the
    frame's mean luma in exact integer milli-units. The explode
    happens INSIDE the Arrow batch — frame rows never round-trip
    through Python row objects, and a video's frames never leave its
    partition."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("frame_idx", IntegerType(), False),
            StructField("mean_luma_milli", LongType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lumas = [], [], []
            for vid, b in zip(pdf[id_col], pdf[blob_col]):
                if b is None:
                    continue
                for i, luma in codec.sample_frames(bytes(b), every_k):
                    ids.append(vid)
                    idxs.append(i)
                    lumas.append(luma)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "mean_luma_milli": lumas}
            )

    return df.select(id_col, blob_col).mapInPandas(fn, out_schema)
