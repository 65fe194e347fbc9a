"""Index + search e2e parity: Spark job vs the pure-Python oracle
(SURVEY §5.3 rows 'dedup parity' and 'index/search e2e')."""

import pytest
from pyspark.sql import functions as F

from tests.oracle import indexer_sim as osim
from web_crawler_search_engine_spark.plans import search as S
from web_crawler_search_engine_spark.plans.indexer import build_index
from web_crawler_search_engine_spark.sources.corpus import generate_world

QUERIES = [
    "lantern",
    "granite harbor",
    "quartz river summit",
    "the crawler walks",
    "seeded images of pure noise",
    "LANTERN Meadow",
    "nebula 1234",
    "nebula 123456789",  # long numeric dropped from tokens
    "zzzunknownzzz",
    "lanterns meadows quartzes",  # bigrams miss -> stemmed fallback
    "apple",
    "apple bridge",
    "apple bridge circuit dawn",
    "ember forest granite",
    "walks the synthetic web",
    "politely one host",
    "beacon canyon delta engine",
    "images",
    "crawler",
    "small seeded images",
]


@pytest.fixture(scope="module")
def world():
    return generate_world(n=100, hosts=4, seed=13, with_images=False)


@pytest.fixture(scope="module")
def oracle_index(world):
    return osim.build_index_oracle(
        [{"url": r["url"], "content": r["content"]} for r in world.rows]
    )


@pytest.fixture(scope="module")
def engine_index(spark, world):
    pages = spark.createDataFrame(
        [(r["url"], r["content"]) for r in world.rows], "url string, content string"
    )
    docs, postings, n = build_index(pages)
    return docs.persist(), postings.persist(), n


def test_docs_table_matches(engine_index, oracle_index):
    docs_df, _, n = engine_index
    odocs, _ = oracle_index
    got = {r["doc_id"]: (r["url"], r["title"]) for r in docs_df.collect()}
    assert got == odocs
    assert n == len(odocs)


def test_postings_tf_and_scores_match(engine_index, oracle_index):
    _, postings_df, _ = engine_index
    _, opost = oracle_index
    got = {
        (r["token"], r["doc_id"]): (r["tf"], r["score"])
        for r in postings_df.collect()
    }
    assert set(got) == set(opost)
    for key, (tf, score) in got.items():
        otf, oscore = opost[key]
        assert tf == otf, key
        assert abs(score - oscore) <= 1.1e-3, (key, score, oscore)  # C8 %.3f


def test_dedup_dropped_duplicate_pages(engine_index, world, oracle_index):
    docs_df, _, n = engine_index
    dup_urls = {r["url"] for r in world.rows if r["dup_of"]}
    assert dup_urls, "fixture must contain duplicate pages"
    indexed_urls = {r["url"] for r in docs_df.collect()}
    # a dup whose source is also indexed must not be indexed itself
    for r in world.rows:
        if r["dup_of"] and r["dup_of"] in indexed_urls and r["url"] > r["dup_of"]:
            assert r["url"] not in indexed_urls, r["url"]


def test_search_topk_parity(engine_index, oracle_index):
    docs_df, postings_df, _ = engine_index
    odocs, opost = oracle_index
    for q in QUERIES:
        toks, fb = S.query_tokens(q), S.fallback_tokens(q)
        want = osim.search_oracle(odocs, opost, toks, fb, k=5)
        res = S.topk(postings_df, toks, k=5).collect()
        if not res:
            res = S.topk(postings_df, fb, k=5).collect()
        got = [(r["doc_id"], r["score"]) for r in res]
        assert [d for d, _ in got] == [d for d, _ in want], (q, got, want)
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) <= 5e-3, (q, gd, gs, ws)


def test_search_join_returns_metadata(engine_index):
    docs_df, postings_df, _ = engine_index
    out = S.search(postings_df, docs_df, "granite harbor").collect()
    assert out and all(r["url"].startswith("https://") for r in out)


def test_xxh64_oracle_matches_spark(spark):
    from web_crawler_search_engine_spark.functions.hashing import xxh64, xxh64_str

    vals = ["", "a", "hello", "https://h1.example.test/img00000001", "x" * 100]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert got == [xxh64_str(v) for v in vals]
    ldf = spark.createDataFrame([(i,) for i in [0, 1, -1, 2**62]], ["x"])
    lgot = [r[0] for r in ldf.select(F.xxhash64("x")).collect()]
    want = [xxh64(int(i).to_bytes(8, "little", signed=True)) for i in [0, 1, -1, 2**62]]
    assert lgot == want
