"""WARC → index CLI end-to-end: pages archived as *.warc segments
must index to exactly the same (docs, postings) as the same pages fed
through the pages-log path — the archive container must be invisible
to S9/X2/A8."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def test_index_from_warc_equals_index_from_pages(
    spark, tmp_path, monkeypatch, capsys
):
    from jobs import index_job
    from web_crawler_search_engine_spark.plans.indexer import build_index
    from web_crawler_search_engine_spark.sources.corpus import generate_world
    from web_crawler_search_engine_spark.sources.warc import (
        write_warc_segments,
    )

    world = generate_world(n=40, hosts=4, seed=23)
    pages = [(r["url"], r["content"]) for r in world.rows]
    warc_dir = tmp_path / "segments"
    write_warc_segments(
        [
            (url, "2024-01-01T00:00:00Z", "text/html", content.encode())
            for url, content in pages
        ],
        str(warc_dir),
        n_segments=3,
    )

    out = tmp_path / "index"
    monkeypatch.setattr(
        sys,
        "argv",
        ["index_job.py", "--warc-dir", str(warc_dir), "--out", str(out)],
    )
    index_job.main()
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # reference path: the same pages through build_index directly
    pages_df = spark.createDataFrame(pages, "url string, content string")
    docs_want, postings_want, n_want = build_index(pages_df)
    assert metrics["docs"] == n_want

    docs_got = spark.read.parquet(str(out / "docs"))
    want_docs = {
        (r["doc_id"], r["url"]) for r in docs_want.select("doc_id", "url").collect()
    }
    got_docs = {
        (r["doc_id"], r["url"]) for r in docs_got.select("doc_id", "url").collect()
    }
    assert got_docs == want_docs

    post_got = spark.read.parquet(str(out / "postings"))
    want_post = {
        (r["token"], r["doc_id"], r["score"])
        for r in postings_want.select("token", "doc_id", "score").collect()
    }
    got_post = {
        (r["token"], r["doc_id"], r["score"])
        for r in post_got.select("token", "doc_id", "score").collect()
    }
    assert got_post == want_post
