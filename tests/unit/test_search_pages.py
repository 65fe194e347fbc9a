"""latest_pages (plans/search.py): the serving-side guard for TTL
re-crawled checkpoints — the pages log holds one row per (url, round)
fetch, snippets must come from the latest round only (ADVICE r4 low
#2: without it the snippet join fans out duplicate result rows and
batch vs --serve diverge on which duplicate wins)."""

from __future__ import annotations

from web_crawler_search_engine_spark.plans.search import latest_pages


def _log(spark, rows):
    return spark.createDataFrame(rows, "url string, content string, round int")


def test_latest_round_wins_one_row_per_url(spark):
    log = _log(
        spark,
        [
            ("http://a/", "old a", 1),
            ("http://a/", "new a", 3),
            ("http://b/", "only b", 2),
            ("http://c/", "old c", 0),
            ("http://c/", "mid c", 1),
            ("http://c/", "new c", 4),
        ],
    )
    got = {r.url: r.content for r in latest_pages(log).collect()}
    assert got == {
        "http://a/": "new a",
        "http://b/": "only b",
        "http://c/": "new c",
    }
    assert latest_pages(log).count() == 3


def test_single_round_log_passes_through(spark):
    rows = [(f"http://h/{i}", f"c{i}", 1) for i in range(10)]
    log = _log(spark, rows)
    got = sorted((r.url, r.content) for r in latest_pages(log).collect())
    assert got == sorted((u, c) for u, c, _ in rows)


def test_plan_is_one_aggregate_no_window(spark):
    """max_by groupBy, not a row_number window: partial aggregation
    (map-side combine) applies, and there is no per-url sort."""
    log = _log(spark, [("http://a/", "x", 1)])
    plan = latest_pages(log)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "max_by" in plan or "HashAggregate" in plan
