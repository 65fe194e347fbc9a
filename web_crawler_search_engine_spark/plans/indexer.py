"""Inverted-index build: the reference's map/spill/merge indexer as
ONE declarative Spark job (SURVEY §3.2).

Reference lifecycle (inverted_indexer/): multiprocess workers spill
sorted partial indexes at 100k postings and k-way merge them twice —
all of which is Spark's sort-based shuffle + partial/final hash
aggregation (P2/P3: zero custom code here). What remains semantic:

  * doc-id assignment: deterministic row_number over url order
    (reference: filesystem rglob order, indexer/__init__.py:95-112 —
    not reproducible; url order is our contract, documented)
  * F10 html gate + F11 10MB size gate
  * X2 exact-dup dedup via the rolling content hash, first doc wins
    (worker.py:118-142; golden = single-worker run => global dedup)
  * per-doc postings: uni/bi/tri-grams over raw + Porter-stemmed
    tokens with h1/h2/h3/strong emphasis boosts (shared/posting.py:
    6-28). NOTE the reference calls webpage.get_text() (which
    decomposes <head>) BEFORE Posting.get_postings reads the same
    soup — so the title boost at posting.py:18 can never fire and
    title text is excluded from postings; reproduced faithfully.
  * tf-idf at the merge: df per token, prune multi-word tokens with
    df < 10, score = (1+ln tf)·ln(N/df) (indexer/__init__.py:188-198)

Scale: the parse UDF is the only Python stage (Arrow-batched, one
pass per doc); everything after explode is codegen'd shuffle work.
postings are written bucketed by token so search-time token lookups
prune to single buckets (replaces the reference's byte-offset
index_of_index seeks, P4).
"""

from __future__ import annotations

import re
from collections import Counter
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.hashing import rolling_hash_str
from ..functions.stemming import stem_cached
from ..operators.scheduler import assign_global_seq

MAX_DOC_BYTES = 10_000_000  # indexer/__init__.py:103
RARE_NGRAM_MIN_DF = 10  # indexer/__init__.py:189
# (tag, weight) — posting.py:18; 'title' never fires (head decomposed
# by get_text before get_postings — see module docstring)
BOOST_WEIGHTS = [("h1", 10000), ("h2", 1000), ("h3", 100), ("strong", 10)]
_SKIP_TEXT = {"style", "script", "code", "head"}
_WORD_RE = re.compile(r"\b[a-zA-Z0-9]+\b")
_WS_RE = re.compile(r"\s+")


class _DocExtractor(HTMLParser):
    """stdlib stand-in for the reference's BeautifulSoup usage:
    text segments (stripped_strings semantics) outside
    head/style/script/code, the LAST <title> text (webpage.py:23-25,
    read before any decompose), and inner text per boost tag."""

    def __init__(self):
        super().__init__()
        self.strings: list[str] = []
        self.titles: list[str] = []
        self.boosts: dict[str, list[str]] = {t: [] for t, _ in BOOST_WEIGHTS}
        self._skip = 0
        self._title = 0
        self._open: list[tuple[str, list[str]]] = []  # boost-tag capture

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT:
            self._skip += 1
        if tag == "title":
            self._title += 1
            self.titles.append("")
        if tag in self.boosts:
            self._open.append((tag, []))

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT and self._skip:
            self._skip -= 1
        if tag == "title" and self._title:
            self._title -= 1
        if tag in self.boosts:
            for i in range(len(self._open) - 1, -1, -1):
                if self._open[i][0] == tag:
                    t, parts = self._open.pop(i)
                    self.boosts[t].append("".join(parts))
                    break

    def handle_data(self, data):
        if self._title and self.titles:
            self.titles[-1] += data
        for _, parts in self._open:
            parts.append(data)
        if self._skip == 0:
            s = _WS_RE.sub(" ", data).strip()
            if s:
                self.strings.append(_WS_RE.sub(" ", data.strip()))


def _word_tokens(s: str) -> list[str]:
    return [t.lower() for t in _WORD_RE.findall(s) if not t.isnumeric() or len(t) <= 4]


def _ngram_counts(token_lists: list[list[str]]) -> Counter:
    """Uni/bi/tri-gram counts; multi-grams need a non-numeric member
    (tokenizer.py:50-63). Grams never cross string boundaries."""
    c: Counter = Counter()
    for toks in token_lists:
        for t in toks:
            c[t] += 1
        for n in (2, 3):
            for i in range(len(toks) - n + 1):
                g = toks[i : i + n]
                if any(not t.isnumeric() for t in g):
                    c[" ".join(g)] += 1
    return c


def _doc_postings(strings: list[str], boosts: dict[str, list[str]]) -> dict[str, int]:
    """posting.py:6-28 per-document semantics."""
    stem = stem_cached()
    raw_lists = [_word_tokens(s) for s in strings]
    freq = _ngram_counts(raw_lists)
    stem_lists = [[stem(t) for t in toks] for toks in raw_lists]
    for token, count in _ngram_counts(stem_lists).items():
        if token not in freq:
            freq[token] = count
    for tag, weight in BOOST_WEIGHTS:
        for text in boosts.get(tag, ()):
            joined = " ".join(t.lower() for t in _WORD_RE.findall(text))
            toks = _word_tokens(joined)
            tokset = set(_ngram_counts([toks])) | set(
                _ngram_counts([[stem(t) for t in toks]])
            )
            for token in freq:
                if token in tokset:
                    freq[token] += weight - 1
    return dict(freq)


_PARSE_SCHEMA = StructType(
    [
        StructField("title", StringType(), True),
        StructField("content_hash", LongType(), True),
        StructField(
            "postings",
            ArrayType(
                StructType(
                    [
                        StructField("token", StringType(), False),
                        StructField("tf", LongType(), False),
                    ]
                )
            ),
            True,
        ),
    ]
)


@F.pandas_udf(_PARSE_SCHEMA)
def parse_doc(content: pd.Series, url: pd.Series) -> pd.DataFrame:
    titles, hashes, postings = [], [], []
    for c, u in zip(content, url):
        if c is None:
            titles.append(None)
            hashes.append(None)
            postings.append(None)
            continue
        ex = _DocExtractor()
        try:
            ex.feed(c)
        except Exception:
            pass
        title = ex.titles[-1].strip() if ex.titles else u
        text_joined = " ".join(ex.strings)
        h = rolling_hash_str(text_joined)
        freq = _doc_postings(ex.strings, ex.boosts)
        titles.append(title)
        hashes.append(h)
        postings.append(list(freq.items()))
    return pd.DataFrame(
        {"title": titles, "content_hash": hashes, "postings": postings}
    )


def parse_pages(pages: DataFrame) -> DataFrame:
    """pages(url, content) -> (url, html_ok, title, content_hash,
    postings): the expensive (pandas-UDF) stage, gated by F11 size and
    F10 html checks. Pure per-page function of (url, content) — its
    output is what the incremental ledger caches across resumes.

    Non-html pages are KEPT as null rows (html_ok=false): doc ids are
    assigned over all size-gated pages (reference: the rglob list is
    enumerated before the html check), so the gate leaves id GAPS that
    finalize_index must reproduce — and the ledger then also skips
    re-examining non-html pages on resume."""
    sized = pages.filter(F.octet_length("content") <= MAX_DOC_BYTES)
    # F10 html gate (indexer/worker.py:10-12)
    flagged = sized.withColumn(
        "html_ok", F.locate("<html", F.lower(F.substring("content", 1, 1024))) > 0
    )
    ok = flagged.filter(F.col("html_ok")).withColumn(
        "d", parse_doc(F.col("content"), F.col("url"))
    ).select(
        "url",
        "html_ok",
        F.col("d.title").alias("title"),
        F.col("d.content_hash").alias("content_hash"),
        F.col("d.postings").alias("postings"),
    )
    bad = flagged.filter(~F.col("html_ok")).select(
        "url",
        "html_ok",
        F.lit(None).cast(StringType()).alias("title"),
        F.lit(None).cast(LongType()).alias("content_hash"),
        F.lit(None).cast(_PARSE_SCHEMA["postings"].dataType).alias("postings"),
    )
    return ok.unionByName(bad)


def finalize_index(
    parsed: DataFrame, dedup_shards: int | None = None
) -> tuple[DataFrame, DataFrame, int]:
    """(url, html_ok, title, content_hash, postings) -> (docs,
    postings, n).

    Deterministic doc-id assignment (url order), X2 first-wins dedup,
    df/tf-idf scoring — all JVM-side. Runs over the FULL parsed set on
    every (re)build: scores depend on global N and df, so the merge
    pass is always global (the reference recomputes tf-idf at its
    final k-way merge too, indexer/__init__.py:188-198); only the
    parse stage is incremental.

    ``dedup_shards``: None = global first-wins dedup (the golden
    single-worker closure). An int W reproduces the reference's
    PER-WORKER dedup (indexer/worker.py:26,118-122 — each process
    keeps its own hash set) with a deterministic worker assignment:
    shard = pmod(xxhash64(url), W); duplicates are only dropped within
    a shard. W=1 equals global."""
    # ids over ALL size-gated pages (html gate afterwards => gapped
    # ids, matching the reference's enumerate-then-gate order)
    ids = assign_global_seq(parsed, ["url"], base=0, seq_col="doc_id").filter(
        F.col("html_ok")
    )
    shard_key = (
        F.lit(0) if dedup_shards is None else F.pmod(F.xxhash64("url"), F.lit(dedup_shards))
    )
    w = Window.partitionBy("content_hash", "_shard").orderBy("doc_id")
    # localCheckpoint, NOT persist: the returned docs/postings frames
    # reference these rows lazily, so a persist could never be
    # unpersisted here — each index build would pin one wide cached
    # DataFrame (titles + full postings arrays) in executor storage
    # forever. Checkpoint blocks are released by the context cleaner
    # once the caller drops the returned frames.
    survivors = (
        ids.withColumn("_shard", shard_key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_shard", "html_ok")
        .localCheckpoint(eager=True)
    )
    n_docs = survivors.count()
    docs = survivors.select("doc_id", "url", "title")
    exploded = survivors.select(
        "doc_id", F.explode("postings").alias("p")
    ).select("doc_id", F.col("p.token").alias("token"), F.col("p.tf").alias("tf"))
    w_tok = Window.partitionBy("token")
    postings = (
        exploded.withColumn("df", F.count("*").over(w_tok))
        .filter(
            (~F.col("token").contains(" ")) | (F.col("df") >= RARE_NGRAM_MIN_DF)
        )
        .withColumn(
            "score",
            F.round(
                (F.lit(1.0) + F.log(F.col("tf").cast("double")))
                * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
                3,
            ),
        )
        .select("token", "doc_id", "tf", "score")
    )
    return docs, postings, n_docs


def build_index(
    pages: DataFrame, dedup_shards: int | None = None
) -> tuple[DataFrame, DataFrame, int]:
    """pages(url, content) -> (docs, postings, n_docs).

    docs: (doc_id, url, title); postings: (token, doc_id, tf, score).
    """
    return finalize_index(parse_pages(pages), dedup_shards)


def build_index_incremental(
    pages: DataFrame,
    store,
    round_id: int | None = None,
    dedup_shards: int | None = None,
) -> tuple[DataFrame, DataFrame, int]:
    """Resumable index build (S8 — indexer/__init__.py:56-63,103): the
    ``parsed_docs`` ledger in ``store`` (a SnapshotStore) anti-joins
    away already-parsed URLs, so a killed-and-restarted build re-runs
    the pandas parse ONLY for new pages. Doc ids, dedup, and tf-idf
    are then recomputed over the full ledger — deterministic functions
    of the url set, so an interrupted-then-resumed build equals the
    single-shot run bit for bit (tested in tests/e2e)."""
    try:
        prev_urls = store.load_log("parsed_docs").select("url")
    except FileNotFoundError:
        prev_urls = None
    fresh = pages if prev_urls is None else pages.join(
        prev_urls, "url", "left_anti"
    )
    if round_id is None:
        # default to the next unused round: committing under an
        # already-used round_id overwrites that round's delta dir
        # (destroying its parsed rows) while appending the same path
        # to the manifest again — silent data loss + double reads
        latest = store.latest_round()
        round_id = 0 if latest is None else latest + 1
    store.commit(round_id, log_appends={"parsed_docs": parse_pages(fresh)})
    return finalize_index(
        store.load_log("parsed_docs"), dedup_shards=dedup_shards
    )


def write_index(docs: DataFrame, postings: DataFrame, path: str, buckets: int = 32):
    """Persist the index with token-bucketed DIRECTORY layout
    (``token_bucket=N/`` hive partitions): a search for a handful of
    query n-grams lists only those bucket directories — directory-level
    partition pruning, the P4 replacement for the reference's
    index_of_index byte seeks (indexer/__init__.py:120-141). Within a
    bucket the rows are sorted by token, so parquet row-group min/max
    stats prune further below directory granularity.

    The bucket function is pmod(xxhash64(token), buckets) — computable
    driver-side (functions/hashing.py xxh64_str) so the reader derives
    the bucket set from the query alone, no lookup job. ``buckets``
    is recorded next to the data; readers must use the stored value."""
    import json as _json
    import os as _os

    (
        postings.withColumn(
            "token_bucket", F.pmod(F.xxhash64("token"), F.lit(buckets)).cast("int")
        )
        .repartition("token_bucket")
        .sortWithinPartitions("token_bucket", "token")
        .write.mode("overwrite")
        .partitionBy("token_bucket")
        .parquet(f"{path}/postings")
    )
    docs.write.mode("overwrite").parquet(f"{path}/docs")
    _os.makedirs(path, exist_ok=True)
    with open(f"{path}/index_meta.json", "w") as fh:
        _json.dump({"buckets": buckets}, fh)


def read_index(spark, path: str):
    """(postings, docs, buckets) for an index written by write_index."""
    import json as _json

    with open(f"{path}/index_meta.json") as fh:
        buckets = int(_json.load(fh)["buckets"])
    return (
        spark.read.parquet(f"{path}/postings"),
        spark.read.parquet(f"{path}/docs"),
        buckets,
    )
