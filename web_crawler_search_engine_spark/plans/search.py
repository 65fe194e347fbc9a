"""Search: query -> token n-grams -> postings lookup -> score sum ->
top-5 -> doc-metadata join -> context snippet (SURVEY §3.3,
start_search_engine.py).

Catalyst plan: scan-with-token-pushdown (isin on the bucketed token
column replaces the reference's index_of_index byte seeks) ->
partial/final agg -> TakeOrderedAndProject -> the collected ≤k rows
broadcast INTO the docs/pages scans. Query prep (C2/C3/C12) is
driver-side Python — queries are single strings, not data. The top-k
is collected once (≤ k rows) so the empty-check, metadata join, and
snippet pass share one scoring execution and nothing stays cached
behind (the r1 version ran the query twice; r2.0 leaked one persisted
DataFrame per query)."""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.stemming import stem

_WORD_RE = re.compile(r"\b[a-zA-Z0-9]+\b")


def _base_tokens(query: str) -> list[str]:
    """start_search_engine.py:50: lowercase alnum words; numeric only
    when <= 4 chars."""
    return [
        t.lower()
        for t in _WORD_RE.findall(query)
        if not t.isnumeric() or len(t) <= 4
    ]


def query_tokens(query: str) -> list[str]:
    """start_search_engine.py:46-62: n-grams with n = clamp(len-1,1,3)
    over raw tokens, plus stemmed n-grams not already present."""
    tokens = _base_tokens(query)
    stemmed = [stem(t) for t in tokens]
    n = min(max(1, len(tokens) - 1), 3)
    grams = [tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    for g in (tuple(stemmed[i : i + n]) for i in range(len(stemmed) - n + 1)):
        if g not in grams:
            grams.append(g)
    return [" ".join(g) for g in grams]


def fallback_tokens(query: str) -> list[str]:
    """start_search_engine.py:38-43: stemmed unigrams."""
    return [stem(t) for t in _base_tokens(query)]


def token_buckets(tokens: list[str], buckets: int) -> list[int]:
    """Driver-side pmod(xxhash64(token), buckets) — bit-equal to the
    Column expression write_index partitioned by (hashing.xxh64_str
    pins Spark's seed-42/UTF-8 semantics), so the bucket set derives
    from the query string alone, with no lookup job."""
    from ..functions.hashing import xxh64_str

    return sorted({xxh64_str(t) % buckets for t in tokens})


def topk(
    postings: DataFrame, tokens: list[str], k: int = 5, buckets: int | None = None
) -> DataFrame:
    """J4 semi-filter + A9 aggregate + O4 top-k. Ties broken by
    doc_id asc (the reference's tie order is dict-insertion order —
    not deterministic; this contract is, both here and in the oracle).

    With ``buckets`` (a write_index layout), the token filter is
    preceded by a token_bucket.isin(...) partition filter: the scan
    lists only the query tokens' bucket directories — the reference's
    index_of_index seek (P4), as directory-level partition pruning."""
    if not tokens:
        return postings.select("doc_id", F.lit(0.0).alias("score")).limit(0)
    if buckets is not None:
        postings = postings.filter(
            F.col("token_bucket").isin(token_buckets(tokens, buckets))
        )
    return (
        postings.filter(F.col("token").isin(tokens))
        .groupBy("doc_id")
        .agg(F.sum("score").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def latest_pages(pages_log: DataFrame) -> DataFrame:
    """One ``(url, content)`` row per url from a pages log that may
    hold several rounds' fetches of the same url (TTL re-crawl
    appends one row per re-fetch — plans/crawl.py recrawl_ttl).
    Latest round wins. Without this, the snippet join fans out
    duplicate result rows and the dict build in search_rows picks an
    arbitrary duplicate's snippet, so --serve and batch output
    diverge on a TTL-crawled checkpoint (ADVICE r4 low #2). One
    map-side-combined groupBy at pages-log volume."""
    return pages_log.groupBy("url").agg(
        F.max_by("content", "round").alias("content")
    )


def snippet_col(content: Column, tokens: list[str]) -> Column:
    """C10 context snippet (shared/webpage.py:55-65): normalize the
    <body> to its alnum words joined by single spaces, then for each
    query word IN ORDER take the 300 chars from its first (lowercased)
    occurrence — the reference loop overwrites, so the LAST matching
    word wins (quirk reproduced: equivalent to first match scanning
    the words in reverse). Pure Column expressions — locate/substring
    run in whole-stage codegen; the token list is a driver-side
    constant, never data."""
    words: list[str] = []
    for t in tokens:
        words.extend(t.split(" "))
    body = F.regexp_extract(content, r"(?s)<body[^>]*>(.*)</body>", 1)
    body = F.when(body == "", content).otherwise(body)
    text = F.regexp_replace(body, r"<[^>]+>", " ")
    text = F.trim(F.regexp_replace(text, r"[^a-zA-Z0-9]+", " "))
    ctx = F.lit("")
    for w in words:  # later words overwrite => build when-chain forward
        pos = F.locate(w.lower(), F.lower(text))
        ctx = F.when(pos > 0, F.substring(text, pos, 300)).otherwise(ctx)
    return ctx


def search(
    postings: DataFrame,
    docs: DataFrame,
    query: str,
    k: int = 5,
    pages: DataFrame | None = None,
    buckets: int | None = None,
) -> DataFrame:
    """Full query lifecycle incl. the empty-result stemmed-unigram
    fallback re-query (start_search_engine.py:38-43). With ``pages``
    (url, content) the result carries the C10 ``context`` snippet,
    computed via a broadcast of the tiny top-k INTO the pages scan.
    ``buckets``: enable write_index partition pruning (see topk)."""
    spark = postings.sparkSession
    tokens = query_tokens(query)
    # the top-k is ≤ k rows: collect it once and continue from a local
    # DataFrame — one job for scoring, nothing left cached behind (the
    # r2.0 persist leaked one cached DataFrame per query in a REPL)
    first = topk(postings, tokens, k, buckets=buckets)
    rows = first.collect()
    if not rows:
        fb = fallback_tokens(query)
        rows = topk(postings, fb, k, buckets=buckets).collect()
        tokens = fb
    res = spark.createDataFrame(rows, schema=first.schema)
    # broadcast the ≤k result INTO the docs scan (map-side, prunes to
    # k rows regardless of docs-table size)
    out = docs.join(F.broadcast(res), "doc_id").select(
        "doc_id", "url", "title", "score"
    )
    if pages is not None:
        # top-k is ≤ k rows: broadcast-semi it into the pages scan so
        # only matching pages compute their snippet (map-side), then
        # LEFT-join the ≤ k snippets back — a result doc with no pages
        # row keeps its hit with an empty context, matching the
        # reference (r2 ADVICE: the inner join silently dropped it)
        ctx = pages.join(
            F.broadcast(out.select("url")), "url", "left_semi"
        ).select("url", snippet_col(F.col("content"), tokens).alias("context"))
        out = out.join(F.broadcast(ctx), "url", "left").select(
            "doc_id",
            "url",
            "title",
            "score",
            F.coalesce(F.col("context"), F.lit("")).alias("context"),
        )
    return out.orderBy(F.desc("score"), F.asc("doc_id"))


def search_rows(
    postings: DataFrame,
    docs: DataFrame,
    query: str,
    k: int = 5,
    pages: DataFrame | None = None,
    buckets: int | None = None,
) -> list[dict]:
    """Warm-serving twin of ``search`` (r3 verdict item 7): identical
    results as plain dicts, optimized for a RESIDENT process answering
    many queries over one loaded index (jobs/search_job.py --serve,
    bench serve_rehearsal).

    ``search`` pays two extra per-query costs that only matter at
    point-query latency: a createDataFrame + broadcast-exchange to
    join the ≤k hits into the docs table, and another for snippets.
    Here the ≤k hit set stays DRIVER-side and the metadata/pages
    lookups are plain isin-filtered scans (still pruned/cached,
    still one job each, no exchange). Equivalence with ``search`` is
    pinned by tests/unit/test_plans.py."""
    tokens = query_tokens(query)
    hits = topk(postings, tokens, k, buckets=buckets).collect()
    if not hits:
        tokens = fallback_tokens(query)
        hits = topk(postings, tokens, k, buckets=buckets).collect()
    if not hits:
        return []
    score = {r["doc_id"]: r["score"] for r in hits}
    meta = (
        docs.filter(F.col("doc_id").isin(list(score)))
        .select("doc_id", "url", "title")
        .collect()
    )
    out = [
        {
            "doc_id": m["doc_id"],
            "url": m["url"],
            "title": m["title"],
            "score": score[m["doc_id"]],
        }
        for m in meta
    ]
    if pages is not None:
        ctx_rows = (
            pages.filter(F.col("url").isin([o["url"] for o in out]))
            .select(
                "url", snippet_col(F.col("content"), tokens).alias("context")
            )
            .collect()
        )
        ctx = {r["url"]: r["context"] for r in ctx_rows}
        for o in out:
            o["context"] = ctx.get(o["url"], "")
    out.sort(key=lambda o: (-o["score"], o["doc_id"]))
    return out
