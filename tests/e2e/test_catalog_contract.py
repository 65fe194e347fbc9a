"""Driver-contract gate, in-suite: a fast representative subset of the
catalog compared Spark-vs-DuckDB at sf0.001 (SURVEY §5.3 'driver
contract' row). The full catalog sweep is tools/check_catalog.py."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tools"))

from check_catalog import compare_query, duck_con  # noqa: E402

SF = "/root/testdata/sf0.001"

SUBSET = [
    "q_pricing_summary",
    "q_politeness_admission",
    "q_anti_join_seen",
    "q_exact_dedup",
    "q_tfidf",
    "q_search_top5",
    "q_dedup_minhash_lsh",
    "q_ann_cosine_topk",
    "q_quality_score",
    "q_robots_gate",
    "q_dedup_clusters",
    "q_corpus_select",
    "q_image_dedup_decision",
    "q_audio_features",
    "q_video_frame_sample",
    "q_image_hamming_pairs",
    "q_caption_carry",
    "q_image_quality",
    "q_image_neardup_clusters",
    "q_image_curate",
    "q_doc_repetition",
    "q_pii_scrub",
    "q_domain_sample",
    "q_kmeans_ivf",
    "q_paragraph_dedup",
    "q_substring_spans",
    "q_semdedup",
    "q_semdedup_trained",
    "q_dedup_embedding_cosine",
    "q_pagerank",
    "q_bm25",
    "q_stratified_split",
    "q_cuckoo_probe",
    "q_recrawl_ttl",
]


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    return duck_con(SF)


@pytest.mark.parametrize("name", SUBSET)
def test_catalog_matches_oracle(spark, con, contract, name):
    qs, oracles = contract
    ok, detail = compare_query(spark, con, qs[name], oracles[name], SF)
    assert ok, f"{name}: {detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "score", "source"}


def test_every_query_has_consistent_registry():
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
