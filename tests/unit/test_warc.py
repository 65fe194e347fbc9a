"""WARC source: spec framing round-trip, damage tolerance, and the
pages-table adapter over the distributed binaryFile+mapInPandas path."""

import pytest
from pyspark.sql import functions as F

from web_crawler_search_engine_spark.sources import warc as W


@pytest.fixture(scope="module")
def rows():
    return [
        (
            f"http://host{i % 7}.example.com/p/{i}",
            "2024-01-01T00:00:00Z",
            "text/html" if i % 3 else "image/png",
            (f"<html><title>t{i}</title>{'x' * (i % 50)}</html>").encode(),
        )
        for i in range(200)
    ]


def test_encode_parse_roundtrip(rows):
    blob = W.encode_warc(rows)
    got = list(W.parse_warc_bytes(blob))
    assert got == rows  # warcinfo skipped, every response recovered


def test_parser_skips_damage(rows):
    blob = W.encode_warc(rows[:10])
    # mid-file garbage between records + truncated final record
    cut = blob.rfind(b"WARC/1.0")
    damaged = blob[:cut] + b"\x00garbage\x00" + blob[cut : cut + 40]
    got = list(W.parse_warc_bytes(damaged))
    assert [g[0] for g in got] == [r[0] for r in rows[:9]]


def test_read_warc_distributed(spark, rows, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("warc"))
    W.write_warc_segments(rows, out, n_segments=4)
    df = W.read_warc(spark, out)
    assert df.rdd.getNumPartitions() >= 1
    got = sorted(
        (r.url, r.warc_date, r.content_type, bytes(r.payload))
        for r in df.collect()
    )
    assert got == sorted(rows)
    # segment column fans records back to their file
    assert df.select("segment").distinct().count() == 4


def test_pages_adapter_feeds_gates(spark, rows, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("warc2"))
    W.write_warc_segments(rows, out, n_segments=2)
    pages = W.pages_from_warc(spark, out)
    html = pages.filter(F.col("content_type").startswith("text/html"))
    assert html.count() == sum(1 for r in rows if r[2] == "text/html")
    one = html.filter(F.col("content").contains("<title>t4</title>")).collect()
    assert len(one) == 1 and one[0].length == len(rows[4][3])
