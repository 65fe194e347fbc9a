"""plans/ann.py — IVF-partitioned on-disk ANN index.

Locks (a) bit-for-bit equivalence between the written-layout search
and the in-memory catalog operator q_ann_ivf_topk (same quantizer,
same probe scheme, same tie rule), (b) the PartitionFilters plan
shape — the scan must list only the probed bucket directories, the
whole point of the layout (write_index's token_bucket twin), and
(c) the meta contract (readers use the stored n_planes)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from web_crawler_search_engine_spark.plans import ann
from web_crawler_search_engine_spark.plans.catalog import q_ann_ivf_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ivf_index(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path_factory.mktemp("ivf"))
    ann.write_ivf_index(emb.select("vec_id", "embedding"), path)
    corpus, n_planes = ann.read_ivf_index(spark, path)
    return emb, corpus, n_planes


def test_meta_roundtrip(ivf_index):
    _, corpus, n_planes = ivf_index
    assert n_planes == 8
    assert set(corpus.columns) == {"vec_id", "embedding", "bucket"}


def test_written_ann_matches_catalog_operator(spark, ivf_index):
    """ann_topk over the written layout returns the identical
    (query_id, neighbor_id, rank) triples as the in-memory multiprobe
    catalog operator (which the DuckDB oracle hash-checks), for the
    catalog's own query set (vec_id < 10)."""
    emb, corpus, n_planes = ivf_index
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ann.ann_topk(
            corpus, queries, k=3, n_planes=n_planes
        ).collect()
    )
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in q_ann_ivf_topk(spark, SF).collect()
    )
    assert got == want


def test_partition_pruned_probe_plan(spark, ivf_index):
    """The probe scan carries a PartitionFilters entry on bucket —
    directory-level pruning, not a post-scan filter."""
    emb, corpus, n_planes = ivf_index
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    result = ann.ann_topk(corpus, queries, k=3, n_planes=n_planes)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        result.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan, plan
    # and the result is still non-trivial on this corpus
    assert result.count() > 0


def test_self_match_toggle(spark, ivf_index):
    """With exclude_self=False a corpus-member query finds itself at
    rank 1 with cosine 1.0 (identity sanity for the scoring fold)."""
    emb, corpus, n_planes = ivf_index
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rows = ann.ann_topk(
        corpus, queries, k=1, n_planes=n_planes, exclude_self=False
    ).collect()
    assert len(rows) == 1
    assert rows[0]["neighbor_id"] == 0 and rows[0]["cos"] == 1.0
