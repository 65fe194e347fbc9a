"""Interleaved same-JVM A/B: old two-job warm search path vs the fused
single-job path (r5, plans/search.search_rows).

Host-noise protocol (BENCH/BASELINE.md): identical runs swing up to 2×
across minutes, so the ONLY valid comparison interleaves both variants
in one JVM with order alternated per pair. Builds the serve_rehearsal
synthetic index once, then per query runs A and B back-to-back
(A-first on even pairs, B-first on odd), reporting per-variant p50.

  A = legacy: topk.collect() then isin-filtered metadata collect
      (two driver actions, two DataFrame-API plans)
  B = covering ServingIndex: (url,title) denormalized into the
      postings cache at load; per query ONE spark.sql call, one job
      (plans/search.ServingIndex)

Usage: python tools/serve_ab.py [n_pages] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def legacy_rows(postings, docs, query, k, buckets):
    """The pre-r5 search_rows body: two driver actions per query."""
    from web_crawler_search_engine_spark.plans.search import (
        fallback_tokens,
        query_tokens,
        topk,
    )

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
    out.sort(key=lambda o: (-o["score"], o["doc_id"]))
    return out


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("serve_ab")
        .config("spark.sql.shuffle.partitions", str(max(cpus // 4, 2)))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import shutil
    import tempfile

    from web_crawler_search_engine_spark.plans.indexer import (
        build_index,
        read_index,
        write_index,
    )
    from web_crawler_search_engine_spark.plans.search import ServingIndex
    from web_crawler_search_engine_spark.sources.corpus import _WORDS

    vocab = sorted(set(_WORDS))
    varr = F.array(*[F.lit(w) for w in vocab])

    def word(j: int):
        idx = (
            F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(len(vocab))) + 1
        ).cast("int")
        return F.element_at(varr, idx)

    title = F.concat_ws(" ", word(0), word(1))
    body = F.concat_ws(" ", *[word(j) for j in range(2, 60)])
    content = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title></head><body><h1>"),
        title,
        F.lit("</h1><p>"),
        body,
        F.lit("</p></body></html>"),
    )
    pages = spark.range(n_pages).select(
        F.concat(F.lit("http://bench.example/p"), F.col("id")).alias("url"),
        content.alias("content"),
    )
    docs, postings, _ = build_index(pages)
    tmp = tempfile.mkdtemp(prefix="serve_ab_")
    try:
        write_index(docs, postings, tmp)
        postings_r, docs_r, buckets = read_index(spark, tmp)
        postings_r = postings_r.persist()
        docs_r = docs_r.persist()
        postings_r.count()
        docs_r.count()

        idx = ServingIndex(postings_r, docs_r, buckets=buckets)

        queries = [
            f"{vocab[(7 * i) % len(vocab)]} {vocab[(11 * i + 3) % len(vocab)]}"
            for i in range(n_q)
        ]
        # warm both paths once (plan caches, codegen)
        legacy_rows(postings_r, docs_r, queries[0], 5, buckets)
        idx.query(queries[0], k=5)

        a_ms, b_ms = [], []
        for i, q in enumerate(queries):
            order = ("A", "B") if i % 2 == 0 else ("B", "A")
            for which in order:
                t0 = time.monotonic()
                if which == "A":
                    ra = legacy_rows(postings_r, docs_r, q, 5, buckets)
                    a_ms.append((time.monotonic() - t0) * 1000.0)
                else:
                    rb = idx.query(q, k=5)
                    b_ms.append((time.monotonic() - t0) * 1000.0)
            assert ra == rb, q  # equivalence on every pair

        idx.close()
        a_ms.sort()
        b_ms.sort()
        p = lambda xs, q: xs[min(int(q * len(xs)), len(xs) - 1)]  # noqa: E731
        print(
            f"pairs={n_q} pages={n_pages}  "
            f"A(legacy 2-job)    p50={p(a_ms, 0.5):.1f} p90={p(a_ms, 0.9):.1f}  "
            f"B(covering 1-job)  p50={p(b_ms, 0.5):.1f} p90={p(b_ms, 0.9):.1f}  "
            f"speedup p50={p(a_ms, 0.5) / p(b_ms, 0.5):.2f}x"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
