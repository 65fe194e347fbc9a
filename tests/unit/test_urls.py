"""URL canonicalization + validity: Spark Column exprs vs the stdlib
oracle (tests/oracle/reference_impl.py), incl. hypothesis property
tests over adversarial URLs (SURVEY.md §5.3 row 1)."""

import string

import pytest


from pyspark.sql import functions as F

from tests.oracle import reference_impl as ref
from web_crawler_search_engine_spark.functions import urls as U

ROOTS = [".example.test"]

ADVERSARIAL = [
    "https://h1.example.test/",
    "https://h1.example.test",
    "http://h1.example.test/a/b",
    "HTTP://H1.EXAMPLE.TEST/A/B/",
    "https://h1.example.test/a%20b/c%2Fd",
    "https://h1.example.test/a+b",
    "https://h1.example.test/a/b/a",  # duplicate segments
    "https://h1.example.test/a/doku.php/x",
    "https://h1.example.test/x.pdf",
    "https://h1.example.test/x.jpeg",
    "https://h1.example.test/x.data-original",
    "https://h1.example.test/x.tar.gz",
    "https://h1.example.test/x.html",
    "https://h1.example.test/p?ical=1",
    "https://h1.example.test/p?a=1&share=2",
    "https://h1.example.test/p?afg12_page_id=3",
    "https://h1.example.test/p?myfilter_x=1",
    "https://h1.example.test/p?share",  # no value -> param ignored
    "https://h1.example.test/p?share=",  # empty value -> ignored
    "https://h1.example.test/p?sh%61re=1",  # encoded name
    "https://h1.example.test/p?a=1&b=2",
    "ftp://h1.example.test/x",
    "https://other.domain/x",
    "https://h1.example.test/a//b",
    "https://h1.example.test///",
    "https://h1.example.test/p?=x",
    "https://sub.h1.example.test/deep/path?q=ok",
    "https://h1.example.test/x.PDF",
    "https://h1.example.test/x.Z",
]


def _spark_eval(spark, urls, col_fn):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r[0] for r in df.select(col_fn(F.col("url"))).collect()]


def test_canonicalize_matches_oracle(spark):
    got = _spark_eval(spark, ADVERSARIAL, U.canonicalize)
    want = [ref.normalize_url(u) for u in ADVERSARIAL]
    assert got == want


def test_is_valid_matches_oracle(spark):
    got = _spark_eval(spark, ADVERSARIAL, lambda c: U.is_valid(c, ROOTS))
    want = [ref.is_valid(u, ROOTS) for u in ADVERSARIAL]
    assert got == want, [
        (u, g, w) for u, g, w in zip(ADVERSARIAL, got, want) if g != w
    ]


def test_every_blacklisted_extension_rejected(spark):
    import re

    exts = re.findall(r"[a-z0-9?-]+", U.EXT_BLACKLIST_RE.split("(", 1)[1])
    # expand the regex alternatives jpe?g / tiff? into concrete cases
    urls = [f"https://h1.example.test/f.{e}" for e in ["jpg", "jpeg", "tif", "tiff", "css", "zip", "gz", "php"]]
    got = _spark_eval(spark, urls, lambda c: U.is_valid(c, ROOTS))
    assert got == [False] * len(urls)
    assert len(exts) > 50  # the full list is present


def _random_urls(n=400, seed=7):
    """Seeded adversarial URL generator (batched: one Spark job for
    all examples — hypothesis-per-example round-trips are too slow)."""
    import random

    rng = random.Random(seed)
    hosts = ["h1.example.test", "H2.Example.Test", "x.other.org", "h1.example.test:8080"]
    schemes = ["http", "https", "ftp", "HTTPS"]
    pchars = string.ascii_lowercase + string.digits + "/-._"
    qchars = string.ascii_lowercase + string.digits + "=&-_+"
    out = []
    for _ in range(n):
        path = "".join(rng.choice(pchars) for _ in range(rng.randint(0, 30)))
        query = "".join(rng.choice(qchars) for _ in range(rng.randint(0, 20)))
        url = f"{rng.choice(schemes)}://{rng.choice(hosts)}/{path}"
        if query:
            url += f"?{query}"
        out.append(url)
    return out


def test_is_valid_property_batch(spark):
    urls = _random_urls()
    got = _spark_eval(spark, urls, lambda c: U.is_valid(c, ROOTS))
    want = [ref.is_valid(u, ROOTS) for u in urls]
    bad = [(u, g, w) for u, g, w in zip(urls, got, want) if g != w]
    assert not bad, bad[:10]


def test_canonicalize_property_batch(spark):
    # wellformed-escape URLs (incl. valid %XX), the crawl pipeline's domain
    import random

    rng = random.Random(11)
    chars = string.ascii_letters + string.digits + "/-._~?=&+"
    urls = []
    for _ in range(400):
        tail = "".join(rng.choice(chars) for _ in range(rng.randint(0, 40)))
        if rng.random() < 0.3:
            tail += "%%%02X" % rng.randint(32, 126)
        urls.append("http://H1.example.test/" + tail)
    got = _spark_eval(spark, urls, U.canonicalize)
    want = [ref.normalize_url(u) for u in urls]
    bad = [(u, g, w) for u, g, w in zip(urls, got, want) if g != w]
    assert not bad, bad[:10]


def test_canonicalize_percent_escapes(spark):
    cases = [
        "https://h.example.test/a%20b",
        "https://h.example.test/%2F%2f",
        "https://h.example.test/%E2%82%AC",  # utf-8 euro
        "https://h.example.test/a%2Bb",
    ]
    got = _spark_eval(spark, cases, U.canonicalize)
    want = [ref.normalize_url(u) for u in cases]
    assert got == want


def test_url_key_is_xxhash64_of_canonical(spark):
    df = spark.createDataFrame([("https://h.example.test/a/",)], ["url"])
    row = df.select(
        U.url_key(U.canonicalize(F.col("url"))).alias("k"),
        F.xxhash64(F.lit("https://h.example.test/a")).alias("expect"),
    ).collect()[0]
    assert row["k"] == row["expect"]
