"""Ground-truth invariants for the batch-6 corpus operators
(q_paragraph_dedup, q_substring_spans, q_semdedup, q_pagerank) —
oracle-INDEPENDENT checks over the planted clone structure, so an
error shared by the Spark query and its DuckDB twin cannot hide
(same discipline as tests/unit/test_image_pairs.py's brute-force
comparison). Clones are planted by catalog._docs_with_dupes /
_emb_with_dupes: every 7th row reappears at id+100000 verbatim.
"""

import pytest
from pyspark.sql import functions as F

from web_crawler_search_engine_spark.plans import catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def clone_ids(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return [
        r.doc_id for r in docs.filter(F.col("doc_id") % 7 == 0).select("doc_id").collect()
    ]


def test_paragraph_dedup_clones_keep_nothing(spark, clone_ids):
    out = {r.doc_id: r for r in catalog.q_paragraph_dedup(spark, SF).collect()}
    for did in clone_ids:
        clone = out[did + 100000]
        orig = out[did]
        # the clone's paragraphs are verbatim copies of the original's,
        # and the original sorts first — the clone keeps zero
        assert clone.n_kept == 0, (did, clone)
        assert clone.n_paras == orig.n_paras
    # originals are first-seen for at least their own non-shared paragraphs
    assert sum(o.n_kept for o in out.values()) > 0


def test_substring_spans_recover_full_clone_runs(spark, clone_ids):
    docs = {
        r.doc_id: len(r.text.split(" "))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    spans = catalog.q_substring_spans(spark, SF).collect()
    by_pair = {(s.doc_a, s.doc_b): s for s in spans}
    for did in clone_ids:
        n_tok = docs[did]
        if n_tok < catalog._SPAN_K + catalog._SPAN_MIN_GRAMS - 1:
            continue  # too short to clear the noise floor
        s = by_pair[(did, did + 100000)]
        # the clone is verbatim: ONE maximal diagonal-0 run covering it
        assert s.a_start == 1 and s.b_start == 1
        assert s.span_tokens == n_tok, (did, n_tok, s)


def test_semdedup_drops_every_clone(spark, clone_ids):
    emb_clones = [
        r.vec_id + 100000
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") % 7 == 0)
        .collect()
    ]
    out = {r.vec_id: r for r in catalog.q_semdedup(spark, SF).collect()}
    for cid in emb_clones:
        # identical embedding => identical cluster and cosine 1.0 with a
        # smaller-id twin => always dropped
        assert out[cid].dropped, cid
        assert out[cid].cluster == out[cid - 100000].cluster
        assert not out[cid - 100000].dropped or any(
            v.vec_id < cid - 100000 and v.cluster == out[cid].cluster
            for v in out.values()
        )


def test_pagerank_mass_and_floor(spark):
    rows = catalog.q_pagerank(spark, SF).collect()
    n = len(rows)
    teleport = 15 * (catalog._PR_SCALE // n) // 100
    total = sum(r["rank"] for r in rows)
    # integer truncation only ever LOSES mass, bounded by ~1 unit per
    # integer division: iters * (edges + nodes) divisions
    lost_bound = catalog._PR_ITERS * (catalog._PR_FANOUT + 2) * n * 100
    assert total <= catalog._PR_SCALE
    assert total >= catalog._PR_SCALE - lost_bound, (total, lost_bound)
    assert all(r["rank"] >= teleport for r in rows)
    # the graph is hash-random: ranks must actually differentiate
    assert len({r["rank"] for r in rows}) > n // 10


def _emb_clone_ids(spark):
    return [
        r.vec_id
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") % 7 == 0)
        .collect()
    ]


def test_banded_embedding_cosine_recall_on_clones(spark):
    """r3-verdict item 3 'done' bar: the BANDED LSH blocking (B bands
    × 16 planes, ≥2¹⁶ buckets per band) must still recall every
    planted clone pair — identical embeddings land in the same bucket
    in every band, so the pair is always a candidate and scores 1.0."""
    assert 2 ** catalog._EMB_PLANES_PER_BAND >= 65536  # band cardinality
    assert catalog._EMB_BANDS >= 2
    pairs = {
        (r.vec_a, r.vec_b): r.cos
        for r in catalog.q_dedup_embedding_cosine(spark, SF).collect()
    }
    clones = _emb_clone_ids(spark)
    assert clones
    for vid in clones:
        assert pairs.get((vid, vid + 100000)) == 1.0, vid


def test_semdedup_trained_drops_every_clone(spark):
    """Same clone ground truth as test_semdedup_drops_every_clone, for
    the TRAINED-quantizer form: identical embeddings share a trained
    cluster and cosine 1.0 with a smaller-id twin => always dropped."""
    out = {
        r.vec_id: r for r in catalog.q_semdedup_trained(spark, SF).collect()
    }
    clones = _emb_clone_ids(spark)
    assert clones
    for vid in clones:
        cid = vid + 100000
        assert out[cid].dropped, cid
        assert out[cid].cluster == out[vid].cluster
    # the trained form must actually use more clusters than the K=8 demo
    assert catalog._SEMT_K > catalog._KM_K
    assert len({r.cluster for r in out.values()}) > 1
