"""Arrow-vectorized image UDFs (U7 + multimodal-column plumbing).

Per BASELINE.json input_hint, all image handling runs through
vectorized pandas/Arrow UDFs — binary column in, typed struct out,
batch-shaped for a 1000-executor cluster: each Arrow batch decodes
independently, so partitioning the pages table is the only scale
knob. The codecs live in images/codec.py (real PNG; the lossy path is
a from-scratch 8x8 block-DCT transform codec with genuine,
PSNR-bounded loss — swap for libjpeg/PIL when available, the
Spark-side schema/partitioning/UDF plumbing is identical).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from . import codec

VERIFY_SCHEMA = StructType(
    [
        StructField("decode_ok", BooleanType(), False),
        StructField("dims_ok", BooleanType(), False),
        StructField("phash_match", BooleanType(), False),
        StructField("phash2", LongType(), True),
        StructField("requant_psnr", DoubleType(), True),
    ]
)


def _verify_one(blob, fmt, w, h, phash):
    if blob is None:
        return (False, False, False, None, None)
    try:
        img = codec.decode(bytes(blob), fmt)
    except Exception:
        return (False, False, False, None, None)
    dims_ok = img.shape == (h, w, 3)
    p2 = codec.phash64(img)
    # codec self-consistency: re-encode -> decode; exact for png
    # (PSNR=inf, min'd to 99), finite-but-high for the DCT lossy
    # codec (quantization is near-idempotent on already-quantized
    # pixels; only the uint8 rounding re-perturbs)
    img2 = codec.decode(codec.encode(img, fmt), fmt)
    ps = codec.psnr(img, img2)
    return (True, bool(dims_ok), bool(p2 == phash), p2, float(min(ps, 99.0)))


@F.pandas_udf(VERIFY_SCHEMA)
def decode_verify(
    blob: pd.Series, fmt: pd.Series, w: pd.Series, h: pd.Series, phash: pd.Series
) -> pd.DataFrame:
    """U7: per-row invariant — decodes, checks dims, recomputes the
    perceptual hash against the stored `phash` column, and checks
    codec idempotence (requant PSNR; >= 40 dB bound asserted by the
    caller for lossy formats)."""
    rows = [
        _verify_one(b, f, int(wi), int(hi), None if p is None else int(p))
        for b, f, wi, hi, p in zip(blob, fmt, w, h, phash)
    ]
    return pd.DataFrame(
        rows, columns=["decode_ok", "dims_ok", "phash_match", "phash2", "requant_psnr"]
    )


@F.pandas_udf(LongType())
def phash_of(blob: pd.Series, fmt: pd.Series) -> pd.Series:
    """Recompute the 64-bit DCT phash from the binary column (X3)."""
    out = []
    for b, f in zip(blob, fmt):
        if b is None:
            out.append(None)
            continue
        try:
            out.append(codec.phash64(codec.decode(bytes(b), f)))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype="object")


@F.pandas_udf(ArrayType(FloatType()))
def image_features(blob: pd.Series, fmt: pd.Series) -> pd.Series:
    """Feature extraction: 16x16 grayscale thumbnail (exact box
    downsample) + per-channel means -> 259-dim float vector. The
    embedding-side input for similarity search over images."""
    out = []
    for b, f in zip(blob, fmt):
        if b is None:
            out.append(None)
            continue
        img = codec.decode(bytes(b), f).astype(np.float32)
        hh, ww = img.shape[:2]
        gray = img @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
        t = gray.reshape(16, hh // 16, 16, ww // 16).mean(axis=(1, 3)) / 255.0
        means = img.reshape(-1, 3).mean(axis=0) / 255.0
        out.append(np.concatenate([t.ravel(), means]).tolist())
    return pd.Series(out)


def resize_images(df, out_dim: int = 32, blob_col: str = "bytes", fmt_col: str = "fmt"):
    """mapInPandas resize: decode -> exact box-downsample to
    (out_dim, out_dim) -> re-encode png. Demonstrates the
    batch-iterator plumbing (schema preserved, bytes/fmt/w/h
    replaced); source dims must be multiples of out_dim."""
    schema = df.schema

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, fmts, ws, hs = [], [], [], []
            for b, f in zip(pdf[blob_col], pdf[fmt_col]):
                if b is None:
                    blobs.append(None)
                    fmts.append(f)
                    ws.append(None)
                    hs.append(None)
                    continue
                img = codec.decode(bytes(b), f)
                hh, ww = img.shape[:2]
                small = (
                    img.astype(np.float64)
                    .reshape(out_dim, hh // out_dim, out_dim, ww // out_dim, 3)
                    .mean(axis=(1, 3))
                    .round()
                    .astype(np.uint8)
                )
                blobs.append(bytearray(codec.png_encode(small)))
                fmts.append("png")
                ws.append(out_dim)
                hs.append(out_dim)
            pdf = pdf.copy()
            pdf[blob_col] = blobs
            pdf[fmt_col] = fmts
            if "w" in pdf.columns:
                pdf["w"] = pd.array(ws, dtype="Int32")
                pdf["h"] = pd.array(hs, dtype="Int32")
            yield pdf

    return df.mapInPandas(fn, schema)


def phash_dedup(df, phash_col: str = "phash", order_col: str = "discovery_seq"):
    """X3: first-seen-wins dedup on the perceptual hash (north_rule:
    'phash dedup of fetched images vs the frontier's seen-set').
    Returns (survivors, duplicates)."""
    from pyspark.sql import Window

    w = Window.partitionBy(phash_col).orderBy(order_col)
    ranked = df.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.filter((F.col("_rn") == 1) | F.col(phash_col).isNull()).drop("_rn"),
        ranked.filter((F.col("_rn") > 1) & F.col(phash_col).isNotNull()).drop("_rn"),
    )


def phash_hamming_pairs(
    df,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
):
    """Banded Hamming near-duplicate join over the stored 64-bit
    perceptual hash: the image-axis extension of the reference's
    exact-phash dedup (X3, inverted_indexer semantics) to
    near-duplicates — the decision a training-data image pipeline
    actually needs (re-encoded / resized copies differ in a few phash
    bits, not zero).

    Scale shape (same design as the text-side SimHash pair join,
    plans/catalog.py q_dedup_simhash_pairs): each hash is split into
    four 16-bit bands, so by pigeonhole any pair with hamming <=
    max_hamming (<= 3) shares at least one identical band. Candidates
    come from one equi-join on the offset-disambiguated band value
    (65,536 distinct values per band — no all-pairs blowup at corpus
    scale), then the exact verify is xor + bit_count, all integer
    domain, all JVM-side Column expressions (no UDF). Works for the
    full signed int64 range: band extraction uses logical
    (shiftrightunsigned) shifts.
    """
    bands = df.select(
        F.col(id_col).alias("_id"),
        F.col(phash_col).alias("_ph"),
        F.explode(
            F.array(
                *[
                    F.shiftrightunsigned(phash_col, 16 * b).bitwiseAND(
                        F.lit(65535)
                    )
                    + F.lit(b * 65536)
                    for b in range(4)
                ]
            )
        ).alias("band"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.col("a._ph").bitwiseXOR(F.col("b._ph")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
