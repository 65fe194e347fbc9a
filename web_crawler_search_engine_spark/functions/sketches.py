"""Mergeable distinct-count sketch primitives (HyperLogLog).

Shared by the batch catalog query (plans/catalog.py
``q_hll_distinct``) and the streaming register maintenance
(streaming/sketch_stream.py): both build registers from the PORTABLE
md5-based hash, so registers computed anywhere — another engine
(DuckDB oracle), another shard, another micro-batch — are
bit-identical and merge with an elementwise max. That merge property
is the whole point at 100 TB: per-shard register tables are m-bounded
(m=512 rows), union+groupBy(max) folds any number of them, and the
estimate is a scalar read over the folded table (Flajolet et al.
2007, the public HLL paper; linear-counting fallback below 2.5m)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_P = 9
HLL_M = 1 << HLL_P  # 512 registers
HLL_W = 51  # 60-bit portable hash minus P bucket bits
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def portable_hash60(col) -> F.Column:
    """60-bit positive hash identical in Spark and DuckDB
    (catalog._phash twin)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hll_registers(values: DataFrame, col: str) -> DataFrame:
    """(bucket, m_j) register table over a value column — duplicates
    are free (max is idempotent), so the input needs no pre-distinct.
    One projection per row, one groupBy bounded by m output rows."""
    h = portable_hash60(F.col(col))
    rest = F.shiftrightunsigned(h, HLL_P)
    rho = F.when(rest == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W) - (F.length(F.bin(rest)) - F.lit(1))
    )
    return (
        values.select(
            F.pmod(h, F.lit(HLL_M)).alias("bucket"), rho.alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def merge_registers(a: DataFrame, b: DataFrame) -> DataFrame:
    """Elementwise max over two register tables — the sketch UNION.
    Full-outer on bucket; both sides are m-bounded, so this is
    dimension-sized regardless of how much data each summarizes."""
    aa = a.select("bucket", F.col("m_j").alias("_ma"))
    bb = b.select("bucket", F.col("m_j").alias("_mb"))
    return aa.join(bb, "bucket", "full_outer").select(
        "bucket",
        F.greatest(
            F.coalesce("_ma", F.lit(0)), F.coalesce("_mb", F.lit(0))
        ).alias("m_j"),
    )


CMS_D = 3
CMS_W = 256


def cms_cells(values: DataFrame, col: str) -> DataFrame:
    """(row, col) cell per value instance per hash row — the Count–Min
    projection (plans/catalog.py q_cms_heavy_hitters twin: same
    'cms{i}:' portable-hash rows, so counters built anywhere agree)."""
    return values.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            portable_hash60(
                                F.concat(F.lit(f"cms{i}:"), F.col(col))
                            ),
                            F.lit(CMS_W),
                        ).alias("col"),
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("c")
    ).select("c.row", "c.col")


def cms_counters(values: DataFrame, col: str) -> DataFrame:
    """(row, col, cnt) counter table — d·w-bounded output, map-side
    combined at any input volume."""
    return cms_cells(values, col).groupBy("row", "col").agg(
        F.count("*").cast("long").alias("cnt")
    )


def merge_counters(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cellwise ADDITION — the CMS union. Unlike the HLL max this is
    NOT idempotent: merging the same delta twice double-counts, which
    is exactly why the streaming ingest gates each merge behind the
    committed batch marker (exactly-once, not at-least-once)."""
    aa = a.select("row", "col", F.col("cnt").alias("_ca"))
    bb = b.select("row", "col", F.col("cnt").alias("_cb"))
    return aa.join(bb, ["row", "col"], "full_outer").select(
        "row",
        "col",
        (
            F.coalesce("_ca", F.lit(0)) + F.coalesce("_cb", F.lit(0))
        ).alias("cnt"),
    )


def hll_estimate(registers: list[tuple[int, int]]) -> float:
    """Driver-side estimate from collected (bucket, m_j) rows —
    registers are ≤ m rows, so this is scalar math, not a data pass."""
    s = sum(2.0 ** -m_j for _, m_j in registers)
    v = len(registers)
    z = HLL_M - v
    e = HLL_ALPHA * HLL_M * HLL_M / (s + z)
    if e <= 2.5 * HLL_M and z > 0:
        return HLL_M * math.log(HLL_M / z)
    return e
