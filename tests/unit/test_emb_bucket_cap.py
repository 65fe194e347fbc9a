"""Adversarial band-bucket cap for embedding-cosine LSH dedup
(catalog.q_dedup_embedding_cosine, r4 verdict #4): a (band,bucket)
block hotter than _EMB_BUCKET_CAP is dropped before the self-join, so
candidate volume is hard-bounded at buckets·(cap choose 2) — and
planted-clone recall is unchanged, because at 2¹⁶ buckets/band only
(near-)identical degenerate clusters ever exceed the cap, and those
are the exact-dedup path's job."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from web_crawler_search_engine_spark.plans.catalog import (
    _EMB_BUCKET_CAP,
    _SQL_EMB_COSINE,
    q_dedup_embedding_cosine,
)

SF = "/root/testdata/sf0.001"

# hot-cluster ids: ≡1 (mod 7) so _emb_with_dupes doesn't clone them,
# and < 100000 so they can't collide with the injected clone-id space
HOT_IDS = [7 * i + 1 for i in range(2000, 2000 + _EMB_BUCKET_CAP + 6)]


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    """embeddings table = the real sf0.001 vectors + a degenerate
    cluster of cap+6 IDENTICAL vectors (an adversarial hot bucket in
    every band)."""
    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    one = base.filter(F.col("vec_id") == 3).select("embedding", "label")
    hot = (
        spark.createDataFrame([(i,) for i in HOT_IDS], "vec_id long")
        .crossJoin(one)
        .select("vec_id", "embedding", "label")
    )
    out = tmp_path_factory.mktemp("embcap")
    base.unionByName(hot).coalesce(2).write.mode("overwrite").parquet(
        str(out / "embeddings.parquet")
    )
    return str(out)


def test_planted_clone_recall_unchanged(spark, adversarial_dir):
    """Every injected clone pair (v, v+100000), v % 7 == 0, survives
    the cap: clone buckets hold ~2 vectors, far below it."""
    pairs = {
        (r.vec_a, r.vec_b)
        for r in q_dedup_embedding_cosine(spark, adversarial_dir).collect()
    }
    base_ids = {
        r.vec_id
        for r in spark.read.parquet(
            f"{adversarial_dir}/embeddings.parquet"
        ).select("vec_id").collect()
    }
    want = {(v, v + 100000) for v in base_ids if v < 100000 and v % 7 == 0}
    assert want, "fixture must contain planted clones"
    assert want <= pairs, "cap must not cost planted-clone recall"


def test_hot_cluster_emits_no_quadratic_pairs(spark, adversarial_dir):
    """All cap+6 identical vectors share every band bucket, so every
    one of their buckets is dropped: zero pairs between hot members —
    a (cap+6 choose 2)-pair quadratic block never reaches the join.
    (Identical vectors are the exact-dedup operator's job.)"""
    hot = set(HOT_IDS)
    pairs = [
        (r.vec_a, r.vec_b)
        for r in q_dedup_embedding_cosine(spark, adversarial_dir).collect()
    ]
    assert not [p for p in pairs if p[0] in hot and p[1] in hot]


def test_oracle_twin_matches_on_adversarial_input(spark, adversarial_dir):
    """The DuckDB oracle implements the same cap: identical pair set
    on the adversarial table."""
    got = sorted(
        (r.vec_a, r.vec_b, r.cos)
        for r in q_dedup_embedding_cosine(spark, adversarial_dir).collect()
    )
    con = duckdb.connect()
    # Spark wrote a parquet DIRECTORY; DuckDB needs the part-file glob
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{adversarial_dir}/embeddings.parquet/*.parquet'"
    )
    want = sorted(map(tuple, con.execute(_SQL_EMB_COSINE).fetchall()))
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, cs), (_, _, cd) in zip(got, want):
        assert abs(cs - cd) < 1e-9
