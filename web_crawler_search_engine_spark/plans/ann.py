"""IVF-partitioned on-disk ANN index — the similarity-search scale path.

``write_ivf_index`` quantizes every vector with the 8-bit
random-hyperplane coarse quantizer (functions/vectors.lsh_bucket_col)
and writes parquet hive-partitioned by ``bucket`` — the embedding twin
of write_index's ``token_bucket`` layout (plans/indexer.py:326-355,
itself the P4 replacement for the reference's index_of_index byte
seeks, reference indexer/__init__.py:120-141).

``ann_topk`` is the multiprobe search over that layout. The query set
is small by contract (a search batch, not a corpus), so its probe
cells — own bucket + the ``probe_hamming``-neighborhood — are
collected driver-side (bounded by |queries| × probes, like seed
handling) and pushed into the scan as a literal
``bucket.isin(...)`` partition filter: Spark lists only
|probe| / 2^n_planes of the bucket directories before any task
launches (the ``PartitionFilters`` plan shape is locked by
tests/unit/test_ann.py). Within the probed cells the search is exact:
broadcast the exploded (query, probe-cell) pairs, equi-join on bucket
so each query scores only ITS cells (O(probes · cell) per query, not
O(probed-corpus × queries)), cosine fold, per-query top-k window over
k·|queries| candidates.

At 100 TB the corpus side never moves: the only shuffle is the
window over the per-query candidate sets, whose size is bounded by
the probed cells — and the broadcast side is the query batch, bounded
by construction.
"""

from __future__ import annotations

import json as _json
import os as _os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, lsh_bucket_col


def write_ivf_index(
    df: DataFrame,
    path: str,
    n_planes: int = 8,
    vec_col: str = "embedding",
) -> None:
    """Bucket + write ``df`` hive-partitioned by the coarse-quantizer
    cell. The bucket is a pure projection (no shuffle of its own); the
    ``repartition("bucket")`` groups rows so each cell writes one file
    per shuffle partition instead of one per input task. ``n_planes``
    is recorded next to the data; readers must use the stored value —
    same contract as write_index's ``buckets``."""
    (
        df.withColumn("bucket", lsh_bucket_col(F.col(vec_col), n_planes))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/vectors")
    )
    _os.makedirs(path, exist_ok=True)
    with open(f"{path}/ivf_meta.json", "w") as fh:
        _json.dump({"n_planes": n_planes}, fh)


def read_ivf_index(spark: SparkSession, path: str) -> tuple[DataFrame, int]:
    """(vectors, n_planes) for an index written by write_ivf_index."""
    with open(f"{path}/ivf_meta.json") as fh:
        n_planes = int(_json.load(fh)["n_planes"])
    return spark.read.parquet(f"{path}/vectors"), n_planes


def _probe_cells_col(bucket_col, n_planes: int, probe_hamming: int):
    """array<long> of probe cells: own bucket (+ Hamming-1 neighbors
    when probe_hamming >= 1). Hamming radii > 1 are out of scope —
    at 8 planes radius 1 already probes 9/256 of the space."""
    cells = [bucket_col]
    if probe_hamming >= 1:
        cells += [
            bucket_col.bitwiseXOR(F.lit(1 << h)) for h in range(n_planes)
        ]
    return F.array(*cells)


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    probe_hamming: int = 1,
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Multiprobe top-k by cosine over an IVF-bucketed ``corpus``
    (vec_id, <vec_col>, bucket — e.g. from read_ivf_index).

    ``queries`` is (query_id, <vec_col>); its buckets are computed
    here, so callers never touch the quantizer. The probe set is
    collected driver-side (bounded by |queries| × (n_planes+1), and by
    2^n_planes absolutely) to become a LITERAL isin partition filter —
    that is what turns hive partitioning into directory pruning.
    ``exclude_self`` drops neighbor_id == query_id rows (queries drawn
    from the corpus itself, the dedup shape). Output: (query_id,
    neighbor_id, rank, cos) with the catalog's deterministic tie rule
    (cos rounded to 6 desc, neighbor_id asc)."""
    q = queries.select(
        F.col("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qbucket", lsh_bucket_col(F.col("qv"), n_planes))
    probes = _probe_cells_col(F.col("qbucket"), n_planes, probe_hamming)
    qp = q.select("query_id", "qv", F.explode(probes).alias("bucket"))

    # driver-bounded: distinct probe cells across the query batch
    probe_set = sorted(
        r["bucket"] for r in qp.select("bucket").distinct().collect()
    )
    pruned = corpus.filter(F.col("bucket").isin(probe_set))

    scored = F.broadcast(qp).join(pruned, ["bucket"])
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("vec_id"))
    scored = scored.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col(vec_col)), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
