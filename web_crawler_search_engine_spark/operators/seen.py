"""URL-seen set: sharded Bloom pre-filter + exact anti-join backstop.

north_rule P8: at 10^10 URLs the per-round seen-set anti-join is the
dominant shuffle — new links vs the full ledger. A Bloom filter keyed
by xxhash64(canonical_url) prunes *definite-unseen* links before the
shuffle: only links the filter says "maybe seen" (true positives +
the ~0.04% false positives at 16 bits/key) enter the exact anti-join.
False positives cannot drop URLs — they just take the exact path; the
exact set stays authoritative (bit-for-bit parity requirement).

Shard layout: keys are range-split by pmod(key, shards); each shard
is an independent numpy bit array built distributively with
applyInPandas and stored as a binary blob (the Iceberg `seen_filter`
table in the full design; collected + closure-broadcast here, which
is the same dataflow a broadcast-variable deployment uses).

Hashing: Kirsch-Mitzenmacher double hashing g_i = h1 + i*h2 over the
two 32-bit halves of the xxhash64 key — no rehash of the URL needed.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_SHARD_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("m_bits", LongType(), False),
        StructField("k", IntegerType(), False),
        StructField("bits", BinaryType(), False),
    ]
)


def _positions(keys: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing on the key halves."""
    u = keys.astype(np.uint64)
    h1 = (u & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = (u >> np.uint64(32)).astype(np.uint64) | np.uint64(1)  # odd => full cycle
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _build_shard(keys: np.ndarray, bits_per_key: int) -> tuple[int, int, bytes]:
    n = max(len(keys), 1)
    m_bits = int(2 ** math.ceil(math.log2(max(n * bits_per_key, 64))))
    k = max(1, int(round(0.693 * bits_per_key)))
    arr = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(keys):
        pos = _positions(keys, k, m_bits).ravel()
        np.bitwise_or.at(arr, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return m_bits, k, arr.tobytes()


def build_seen_filter(
    seen_keys: DataFrame, key_col: str = "url_key", bits_per_key: int = 16, shards: int = 16
) -> DataFrame:
    """Distributed sharded build: one bit-array blob per key shard."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["_shard"].iloc[0]) if len(pdf) else 0
        m_bits, k, blob = _build_shard(pdf[key_col].to_numpy(np.int64), bits_per_key)
        return pd.DataFrame(
            {"shard": [shard], "m_bits": [m_bits], "k": [k], "bits": [blob]}
        )

    keyed = seen_keys.withColumn(
        "_shard", F.pmod(F.col(key_col), F.lit(shards)).cast("int")
    )
    return keyed.groupBy("_shard").applyInPandas(build, _SHARD_SCHEMA)


def make_maybe_seen_udf(shard_blobs: list[dict], shards: int):
    """Membership probe over the sharded filter (no false negatives)."""
    tables = {
        int(b["shard"]): (
            int(b["m_bits"]),
            int(b["k"]),
            np.frombuffer(b["bits"], dtype=np.uint8),
        )
        for b in shard_blobs
    }

    @F.pandas_udf(BooleanType())
    def maybe_seen(key: pd.Series) -> pd.Series:
        keys = key.to_numpy(np.int64)
        out = np.zeros(len(keys), dtype=bool)
        shard_of = (keys % shards + shards) % shards
        for s, (m_bits, k, arr) in tables.items():
            mask = shard_of == s
            if not mask.any():
                continue
            pos = _positions(keys[mask], k, m_bits)
            hit = (arr[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
            out[mask] = hit.all(axis=1)
        return pd.Series(out)

    return maybe_seen


def anti_join_with_bloom(
    new_df: DataFrame,
    seen_keys: DataFrame,
    key_col: str = "url_key",
    bits_per_key: int = 16,
    shards: int = 16,
) -> DataFrame:
    """new_df rows whose key is NOT in seen_keys.

    definite-unseen (Bloom says no) bypasses the shuffle entirely;
    only maybe-seen rows reach the exact anti-join backstop.
    """
    blobs = [r.asDict() for r in build_seen_filter(seen_keys, key_col, bits_per_key, shards).collect()]
    probe = make_maybe_seen_udf(blobs, shards)
    flagged = new_df.withColumn("_maybe", probe(F.col(key_col)))
    definite_unseen = flagged.filter(~F.col("_maybe")).drop("_maybe")
    maybe = flagged.filter(F.col("_maybe")).drop("_maybe")
    checked = maybe.join(seen_keys.select(key_col), key_col, "left_anti")
    return definite_unseen.unionByName(checked)
