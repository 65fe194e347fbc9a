"""Vector-similarity Column expressions — JVM-only, no UDFs.

The embedding operators (catalog ANN queries, plans/ann.py IVF index,
bench ann_rehearsal) all share these three primitives. Everything is
a pure ``pyspark.sql.functions`` composition, so the hot path stays
inside whole-stage codegen and the values are engine-portable (the
DuckDB oracle recomputes the identical integers).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def lsh_planes(
    n_planes: int = 8, dims: int = 64, start: int = 0
) -> list[list[int]]:
    """INTEGER hyperplane weights in [-2048, 2047], derived at
    plan-build time from md5(f"{plane}_{dim}") — the same pseudo-random
    stream both engines previously recomputed per row. Precomputing
    kills 512 per-row md5 calls AND makes the weights literal
    constants, identical across engines by construction. ``start``
    selects planes [start, start+n_planes) from the stream so that
    BANDED schemes (B independent bands of planes, candidate sets
    unioned — the r3-verdict recipe that fixed SimHash) draw disjoint
    planes per band."""
    return [
        [
            int(hashlib.md5(f"{h}_{d}".encode()).hexdigest()[:3], 16) - 2048
            for d in range(1, dims + 1)
        ]
        for h in range(start, start + n_planes)
    ]


def lsh_bucket_col(emb_col, n_planes: int = 8, start: int = 0):
    """Random-hyperplane LSH bucket as a pure JVM Column expression.

    ulp-proof sign test (the r1 hash fail): the embedding is quantized
    to BIGINT (floor(x·10⁶) — floor of an exact IEEE double product is
    engine-independent), the hyperplane weights are BIGINTs, so the
    dot product is an exact integer sum whose sign cannot drift with
    summation order. Positive scaling (10⁶/2048) never flips a sign,
    so the bucket equals the real-valued hyperplane side except within
    quantization noise of the plane itself — fine for LSH (any
    consistent tie rule works) and exactly reproducible."""
    qx = F.transform(
        emb_col, lambda x: F.floor(x.cast("double") * 1000000.0).cast("long")
    )
    bucket = None
    for h, weights in enumerate(lsh_planes(n_planes, start=start)):
        warr = F.array(*[F.lit(w).cast("long") for w in weights])
        dot = F.aggregate(
            F.zip_with(qx, warr, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bit = F.when(dot >= 0, F.lit(1 << h)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def cosine(a, b):
    """Cosine similarity of two array<numeric> columns (zip_with dot +
    aggregate norms — one codegen'd fold per row, no shuffle)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n1 = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    n2 = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (n1 * n2)
