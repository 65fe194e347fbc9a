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


def _build_shard(
    keys: np.ndarray, bits_per_key: int, n_min: int = 0
) -> tuple[int, int, bytes]:
    n = max(len(keys), n_min, 1)
    m_bits = int(2 ** math.ceil(math.log2(max(n * bits_per_key, 64))))
    k = max(1, int(round(0.693 * bits_per_key)))
    arr = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(keys):
        pos = _positions(keys, k, m_bits).ravel()
        np.bitwise_or.at(arr, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return m_bits, k, arr.tobytes()


def build_seen_filter(
    seen_keys: DataFrame,
    key_col: str = "url_key",
    bits_per_key: int = 16,
    shards: int = 64,
    headroom: int = 1,
) -> DataFrame:
    """Distributed sharded build: one bit-array blob per key shard.
    ``headroom`` oversizes each shard by that growth factor so the
    filter absorbs incremental adds (update_seen_filter) before a
    rebuild is worthwhile (FP rate only degrades, never correctness —
    the exact anti-join stays authoritative)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["_shard"].iloc[0]) if len(pdf) else 0
        keys = pdf[key_col].to_numpy(np.int64)
        m_bits, k, blob = _build_shard(
            keys, bits_per_key, n_min=len(keys) * headroom
        )
        return pd.DataFrame(
            {"shard": [shard], "m_bits": [m_bits], "k": [k], "bits": [blob]}
        )

    keyed = seen_keys.withColumn(
        "_shard", F.pmod(F.col(key_col), F.lit(shards)).cast("int")
    )
    return keyed.groupBy("_shard").applyInPandas(build, _SHARD_SCHEMA)


def build_seen_filter_blobs(
    seen_keys: DataFrame,
    key_col: str = "url_key",
    bits_per_key: int = 16,
    shards: int = 64,
    headroom: int = 4,
) -> list[dict]:
    """Collect the shard blobs, completing shards that held no keys
    (an absent shard must still accept incremental adds later)."""
    blobs = {
        int(r["shard"]): r.asDict()
        for r in build_seen_filter(
            seen_keys, key_col, bits_per_key, shards, headroom
        ).collect()
    }
    for s in range(shards):
        if s not in blobs:
            m_bits, k, bits = _build_shard(
                np.empty(0, dtype=np.int64), bits_per_key, n_min=64
            )
            blobs[s] = {"shard": s, "m_bits": m_bits, "k": k, "bits": bits}
    return [blobs[s] for s in range(shards)]


def update_seen_filter(
    shard_blobs: list[dict], new_keys: np.ndarray
) -> list[dict]:
    """OR the positions of ``new_keys`` into existing shard blobs —
    the per-round incremental ledger update (P8: the filter is built
    once and maintained, never rebuilt from the full ledger). The
    per-round key volume is bounded by the admission budget, so a
    driver-side numpy pass suffices; a round too large for that uses
    build_seen_filter on the delta and ORs blobs shard-wise."""
    shards = len(shard_blobs)
    out = []
    for b in shard_blobs:
        s, m_bits, k = int(b["shard"]), int(b["m_bits"]), int(b["k"])
        arr = np.frombuffer(b["bits"], dtype=np.uint8).copy()
        keys = new_keys[(new_keys % shards + shards) % shards == s]
        if len(keys):
            pos = _positions(keys.astype(np.int64), k, m_bits).ravel()
            np.bitwise_or.at(arr, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        out.append({"shard": s, "m_bits": m_bits, "k": k, "bits": arr.tobytes()})
    return out


def make_maybe_seen_udf(shard_blobs: list[dict], shards: int, spark=None):
    """Membership probe over the sharded filter (no false negatives).

    The bit arrays are shipped as a Spark broadcast variable — fetched
    once per Python worker and cached — instead of closure-captured,
    which would re-pickle the full filter into every task command.
    """
    raw = [
        (int(b["shard"]), int(b["m_bits"]), int(b["k"]), b["bits"])
        for b in shard_blobs
    ]
    bc = spark.sparkContext.broadcast(raw) if spark is not None else None

    @F.pandas_udf(BooleanType())
    def maybe_seen(key: pd.Series) -> pd.Series:
        blobs = bc.value if bc is not None else raw
        tables = {
            s: (m, k, np.frombuffer(bits, dtype=np.uint8))
            for s, m, k, bits in blobs
        }
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
    shards: int = 64,
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """new_df rows whose key is NOT in seen_keys.

    The ledger is never shuffled: Bloom-definite-unseen rows need no
    check at all, and for the maybe-seen keys (true dupes + ~0.04% FPs
    at 16 bits/key) we broadcast the small maybe-key set INTO a scan of
    the ledger (left-semi) to recover the exactly-matched keys, then
    broadcast those back for the exact anti-join. Both broadcasts are
    bounded by the maybe-set size; if a pathological batch exceeds
    ``broadcast_limit`` maybe-keys we fall back to the plain shuffle
    anti-join (correct either way — the Bloom is only an accelerator,
    FPs can never drop URLs)."""
    blobs = [
        r.asDict()
        for r in build_seen_filter(seen_keys, key_col, bits_per_key, shards).collect()
    ]
    return anti_join_with_prebuilt(
        new_df, seen_keys, blobs, key_col, shards, broadcast_limit
    )


def anti_join_with_prebuilt(
    new_df: DataFrame,
    seen_keys: DataFrame,
    blobs: list[dict],
    key_col: str = "url_key",
    shards: int = 64,
    broadcast_limit: int = 2_000_000,
) -> DataFrame:
    """anti_join_with_bloom against an already-built (incrementally
    maintained) shard-blob filter — the steady-state per-round path."""
    spark = new_df.sparkSession
    probe = make_maybe_seen_udf(blobs, shards, spark=spark)
    flagged = new_df.withColumn("_maybe", probe(F.col(key_col)))
    maybe_keys = (
        flagged.filter(F.col("_maybe")).select(key_col).distinct()
    )
    n_maybe = maybe_keys.count()
    if n_maybe > broadcast_limit:
        definite_unseen = flagged.filter(~F.col("_maybe")).drop("_maybe")
        checked = (
            flagged.filter(F.col("_maybe"))
            .drop("_maybe")
            .join(seen_keys.select(key_col), key_col, "left_anti")
        )
        return definite_unseen.unionByName(checked)
    matched = seen_keys.select(key_col).join(
        F.broadcast(maybe_keys), key_col, "left_semi"
    )
    return new_df.join(F.broadcast(matched), key_col, "left_anti")
