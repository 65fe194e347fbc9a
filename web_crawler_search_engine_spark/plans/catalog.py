"""Driver-contract query catalog: SURVEY.md §2 operators over the driver's
TPC-H-ish parquet tables, each with a DuckDB oracle SQL twin.

Every entry maps a reference operator (cited ``file:line`` into
``/root/reference``) onto idiomatic Spark DataFrame code, plus the
large-scale training-data-pipeline operators (dedup family, ANN,
text analysis) the north_rule calls for. Column names are aliased
identically in the Spark plan and the oracle SQL; computed doubles
are rounded on both sides so the driver's value-hash comparison is
stable across engines.

Portability notes (Spark ⟷ DuckDB):
  - portable 60-bit hash:  Spark ``conv(substr(md5(s),1,15),16,10)``
    ⟷ DuckDB ``('0x' || substr(md5(s),1,15))::BIGINT`` — same value,
    used wherever both engines must agree on a pseudo-random stream
    (minhash, simhash, LSH hyperplanes).
  - natural log: Spark ``log`` ⟷ DuckDB ``ln``.
  - char streams: Spark ``split(s,'')`` ⟷ DuckDB ``string_split(s,'')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# helpers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _phash(col):
    """Portable 60-bit hash of a string column (same in DuckDB oracle)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_PHASH_SQL = "('0x' || substr(md5({0}), 1, 15))::BIGINT"


# Tokens of the synthetic documents are lowercase ASCII words joined by
# single spaces, so a space split is exact tokenization (C1 analog,
# reference shared/tokenizer.py:27-46); the regex/unicode-exact tokenizer
# lives in functions/text.py and is property-tested separately.
def _tokens(doc_df: DataFrame) -> DataFrame:
    return doc_df.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")


_TOKENS_SQL = (
    "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"
)


# ---------------------------------------------------------------------------
# 1. scan + filter + partial/final aggregation  (A2/A8 analog; TPC-H Q1 shape)


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial+final hash aggregation with map-side combine — the Spark
    equivalent of the reference's lock-guarded per-worker stats merge
    (crawler/worker.py:113-127, frontier.py:29). Filter is pushed to the
    parquet scan; only 7 of 11 lineitem columns are read."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                          AS sum_qty,
       round(sum(l_extendedprice), 2)                     AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
       round(avg(l_quantity), 4)                          AS avg_qty,
       round(avg(l_discount), 4)                          AS avg_disc,
       count(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# 2. top-k + broadcast join  (O4 + J3: start_search_engine.py:73-82)


def q_top5_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 by aggregated score then broadcast-join metadata — the search
    engine's TakeOrderedAndProject + docs lookup (J3). Revenue is rounded
    BEFORE ranking so cross-engine float noise cannot reorder ties;
    tie-break on o_orderkey makes the result unique."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    rev = li.groupBy("l_orderkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )
    top = rev.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(5)
    return (
        top.join(F.broadcast(orders), top.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "revenue",
            F.col("c_name").alias("customer"),
        )
    )


_SQL_TOP5 = """
WITH rev AS (
  SELECT l_orderkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem GROUP BY l_orderkey
  ORDER BY revenue DESC, l_orderkey ASC LIMIT 5
)
SELECT r.l_orderkey AS orderkey, r.revenue, c.c_name AS customer
FROM rev r JOIN orders o ON r.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# ---------------------------------------------------------------------------
# 3. semi join  (J4: start_search_engine.py:89-96 token∈index lookup)


def q_semi_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — posting-list lookup by membership (J4)."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return part.join(li, part.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_brand"
    )


_SQL_SEMI = """
SELECT p_partkey, p_brand FROM part
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_partkey = p_partkey AND l_quantity >= 49)
"""


# ---------------------------------------------------------------------------
# 4. anti join — the URL-seen membership test  (X1: frontier.py:137-146)


def q_anti_join_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: rows NOT in the seen set — exactly the frontier's
    discovered_urls dedup (X1). customer=candidate links, orders=seen."""
    cust = _t(spark, sf_dir, "customer")
    seen = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        seen, cust.c_custkey == seen.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_SQL_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
"""


# ---------------------------------------------------------------------------
# 5. window-ranked politeness admission  (J2/O5/P7: frontier.py:116-135)


def q_politeness_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl scheduler's core primitive: per-host FIFO prefix under a
    budget, as a window row_number (§3.1). Here: first 3 events per user
    in (ts, event_id) order — event_id tie-break keeps it deterministic."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", "rnk")
    )


_SQL_ADMISSION = """
SELECT user_id, event_id, rnk FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rnk
  FROM events) WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# 6. URL canonicalize + hash key  (F1/F2: utils/__init__.py:27-38)

_URL_RAW_SPARK = (
    "concat('HTTP://Host', cast(pmod(user_id, 7) as string), '.Example.COM/Path/',"
    " cast(event_id as string), case when pmod(event_id, 3) = 0 then '/' else '' end)"
)
_URL_RAW_SQL = (
    "('HTTP://Host' || (user_id % 7)::VARCHAR || '.Example.COM/Path/'"
    " || event_id::VARCHAR || (CASE WHEN event_id % 3 = 0 THEN '/' ELSE '' END))"
)


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference canonicalize (utils/__init__.py:34-38): lowercase,
    http→https, strip one trailing slash; sha256 page key
    (utils/__init__.py:27-32) and the north_rule's 64-bit frontier key.
    URLs are synthesized deterministically from events so both engines
    see identical input. The exact engine version (incl. percent-decode
    parity with urllib.parse.unquote) is functions/urls.py, property-
    tested in tests/unit/test_urls.py."""
    ev = _t(spark, sf_dir, "events")
    raw = F.expr(_URL_RAW_SPARK)
    canon = F.regexp_replace(
        F.regexp_replace(F.lower(raw), "^http://", "https://"), "/$", ""
    )
    return ev.select(
        "event_id",
        canon.alias("url_canon"),
        F.sha2(canon, 256).alias("url_sha"),
        _phash(canon).alias("url_key"),
    )


_SQL_CANON = f"""
WITH u AS (SELECT event_id, {_URL_RAW_SQL} AS raw FROM events),
c AS (SELECT event_id,
             regexp_replace(regexp_replace(lower(raw), '^http://', 'https://'),
                            '/$', '') AS url_canon FROM u)
SELECT event_id, url_canon, sha256(url_canon) AS url_sha,
       {_PHASH_SQL.format('url_canon')} AS url_key
FROM c
"""


# ---------------------------------------------------------------------------
# 7. URL validity conjunction  (F3-F7: utils/scraper.py:29-88)

# Deterministic adversarial URL mix: scheme/domain/extension/dup-segment/
# query-param rejects, driven by event_id residues.
_URL_V_SPARK = (
    "concat(case when pmod(event_id, 13) = 0 then 'ftp://' else 'https://' end,"
    " case when pmod(event_id, 17) = 0 then 'evil.org' else"
    " concat('h', cast(pmod(user_id, 5) as string), '.example.com') end,"
    " case when pmod(event_id, 7) = 0 then '/a/b/a' else concat('/p/', cast(event_id as string)) end,"
    " case when pmod(event_id, 5) = 1 then '.pdf' when pmod(event_id, 5) = 2 then '.css' else '.html' end,"
    " case when pmod(event_id, 11) = 0 then '?share=x' else '' end)"
)
_URL_V_SQL = (
    "((CASE WHEN event_id % 13 = 0 THEN 'ftp://' ELSE 'https://' END)"
    " || (CASE WHEN event_id % 17 = 0 THEN 'evil.org' ELSE 'h' || (user_id % 5)::VARCHAR || '.example.com' END)"
    " || (CASE WHEN event_id % 7 = 0 THEN '/a/b/a' ELSE '/p/' || event_id::VARCHAR END)"
    " || (CASE WHEN event_id % 5 = 1 THEN '.pdf' WHEN event_id % 5 = 2 THEN '.css' ELSE '.html' END)"
    " || (CASE WHEN event_id % 11 = 0 THEN '?share=x' ELSE '' END))"
)


def q_url_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """is_valid = scheme∈{http,https} (F3) ∧ domain-allowlist (F4) ∧
    no-dup-path-segments & extension blacklist (F5) ∧ query-param
    blacklist (F6) — the conjunction applied before frontier insert
    (scraper.py:79-88, worker.py:87). All-JVM Column predicates; the full
    ~80-extension regex from scraper.py:57-65 is in functions/urls.py."""
    ev = _t(spark, sf_dir, "events")
    url = F.expr(_URL_V_SPARK)
    scheme_ok = url.startswith("https://") | url.startswith("http://")
    hostpath = F.regexp_replace(url, "^[a-z]+://", "")
    host = F.split(hostpath, "/").getItem(0)
    domain_ok = host.endswith(".example.com")
    path = F.regexp_replace(
        F.regexp_replace(hostpath, r"\?.*$", ""), "^[^/]*", ""
    )
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    no_dup = F.size(segs) == F.size(F.array_distinct(segs))
    ext_ok = ~path.rlike(r"\.(pdf|css|js|png|jpg|gif|zip|gz|tar|mp4)$")
    query_ok = ~url.rlike(r"\?(share|action|ical|image)=")
    return ev.select(
        "event_id",
        url.alias("url"),
        (scheme_ok & domain_ok & no_dup & ext_ok & query_ok).alias("is_valid"),
    )


_SQL_VALIDITY = f"""
WITH u AS (SELECT event_id, {_URL_V_SQL} AS url FROM events),
p AS (
  SELECT event_id, url,
         regexp_replace(url, '^[a-z]+://', '') AS hostpath
  FROM u),
q AS (
  SELECT event_id, url,
         string_split(hostpath, '/')[1] AS host,
         regexp_replace(regexp_replace(hostpath, '\\?.*$', ''),
                        '^[^/]*', '') AS path
  FROM p),
r AS (
  SELECT event_id, url, host, path,
         list_filter(string_split(path, '/'), s -> s <> '') AS segs
  FROM q)
SELECT event_id, url,
       ((url LIKE 'https://%' OR url LIKE 'http://%')
        AND suffix(host, '.example.com')
        AND len(segs) = len(list_distinct(segs))
        AND NOT regexp_matches(path, '\\.(pdf|css|js|png|jpg|gif|zip|gz|tar|mp4)$')
        AND NOT regexp_matches(url, '\\?(share|action|ical|image)=')) AS is_valid
FROM r
"""


# ---------------------------------------------------------------------------
# 8. exact-content dedup, first-seen survivor  (X2: indexer/worker.py:118-159)


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen-wins exact dedup: hash-partition + window row_number —
    the Spark form of the indexer's duplicate-page short-circuit. Dupes
    are injected deterministically (every 7th doc re-appears under a
    shifted id) since the synthetic corpus has none."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    uni = docs.unionByName(dupes).withColumn("content_hash", F.md5("text"))
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        uni.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "content_hash")
    )


_SQL_EXACT_DEDUP = """
WITH uni AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
),
h AS (SELECT doc_id, md5(text) AS content_hash FROM uni)
SELECT doc_id, content_hash FROM (
  SELECT doc_id, content_hash,
         row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
  FROM h) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# 9. rolling polynomial hash  (C5/X2: indexer/worker.py:138-142)


def q_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact dedup fingerprint h=(h*31+ord(c)) mod 2^32,
    expressed as a JVM-side higher-order aggregate over the char stream —
    no Python in the loop. DuckDB's list_reduce seeds with the first
    element, which equals (0*31 + ord(c0)), so both sides agree."""
    docs = _t(spark, sf_dir, "documents")
    chars = F.transform(F.split(F.col("text"), ""), lambda c: F.ascii(c))
    rh = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda h, c: F.pmod(h * F.lit(31) + c, F.lit(4294967296)),
    )
    return docs.select("doc_id", rh.alias("rhash"))


_SQL_ROLLING = """
SELECT doc_id,
       list_reduce(list_transform(string_split(text, ''), c -> ascii(c)::BIGINT),
                   (h, c) -> (h * 31 + c) % 4294967296) AS rhash
FROM documents
"""


# ---------------------------------------------------------------------------
# 10/11. token frequency + page length  (A1/A3: crawler/worker.py:93-98)


def q_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequency — the crawler's lock-merged frequencies dict
    (A1/A2) as one explode+groupBy."""
    docs = _t(spark, sf_dir, "documents")
    return _tokens(docs).groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))


_SQL_WORD_FREQ = f"SELECT token, count(*) AS cnt FROM ({_TOKENS_SQL}) GROUP BY token"


def q_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page token count (A3: page_lengths)."""
    docs = _t(spark, sf_dir, "documents")
    return _tokens(docs).groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))


_SQL_DOC_LEN = f"SELECT doc_id, count(*) AS n_tokens FROM ({_TOKENS_SQL}) GROUP BY doc_id"


# ---------------------------------------------------------------------------
# 12. tf-idf  (A8: indexer/__init__.py:192-198)


def _tfidf_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()  # tiny driver-side scalar, same role as N at :194
    tf = _tokens(docs).groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    wdf = Window.partitionBy("token")
    return tf.withColumn("df", F.count(F.lit(1)).over(wdf)).select(
        "doc_id",
        "token",
        F.round(
            (F.lit(1.0) + F.log(F.col("tf"))) * F.log(F.lit(float(n_docs)) / F.col("df")),
            3,
        ).alias("tfidf"),
    )


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """score = (1+ln(tf))·ln(N/df) rounded to 3 decimals, exactly the
    reference's merge-time computation (A8, C8 '%.3f'). df via a window
    count — one shuffle on token, no self-join."""
    return _tfidf_df(spark, sf_dir)


_TFIDF_SQL_BODY = f"""
WITH tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM ({_TOKENS_SQL}) GROUP BY doc_id, token),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
d AS (SELECT doc_id, token, tf,
             count(*) OVER (PARTITION BY token) AS df FROM tf)
SELECT doc_id, token,
       round((1.0 + ln(tf)) * ln(n.n_docs / d.df), 3) AS tfidf
FROM d, n
"""

_SQL_TFIDF = _TFIDF_SQL_BODY


# ---------------------------------------------------------------------------
# 13. search: tokens → postings → score-sum → top-5 → metadata join
#     (J4 + A9 + O4 + J3: start_search_engine.py:64-115)

_QUERY_TOKENS = ["spark", "merge", "window", "vector"]


def q_search_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full search path: semi-filter postings on query tokens
    (pushdown does the reference's byte-offset seek), sum tf-idf per doc
    (A9), rank on the ROUNDED score with doc_id tie-break (O4), broadcast-
    join doc metadata (J3)."""
    docs = _t(spark, sf_dir, "documents")
    postings = _tfidf_df(spark, sf_dir)
    matched = postings.filter(F.col("token").isin(_QUERY_TOKENS))
    scores = matched.groupBy("doc_id").agg(
        F.round(F.sum("tfidf"), 3).alias("score")
    )
    top = scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(5)
    return top.join(F.broadcast(docs.select("doc_id", "source")), "doc_id").select(
        "doc_id", "score", "source"
    )


_SQL_SEARCH = f"""
WITH postings AS ({_TFIDF_SQL_BODY}),
scores AS (
  SELECT doc_id, round(sum(tfidf), 3) AS score FROM postings
  WHERE token IN ('spark', 'merge', 'window', 'vector')
  GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT 5)
SELECT s.doc_id, s.score, d.source
FROM scores s JOIN documents d ON s.doc_id = d.doc_id
"""


# ---------------------------------------------------------------------------
# 14. bigram generation + rare-n-gram prune  (A4/A5 + F12:
#     tokenizer.py:57-63, indexer/__init__.py:188-190)


def q_bigram_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigrams built JVM-side from the token array (transform over an
    index sequence — no shuffle, no UDF), then document-frequency
    pruning: keep bigrams appearing in ≥ 10 docs, the reference's
    rare-n-gram cutoff (F12)."""
    docs = _t(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    bigrams = F.expr(
        "transform(sequence(1, size(split(text,' ')) - 1),"
        " i -> concat(element_at(split(text,' '), i), ' ',"
        " element_at(split(text,' '), i + 1)))"
    )
    ex = docs.select("doc_id", F.explode(bigrams).alias("bigram"))
    return (
        ex.groupBy("bigram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 10)
    )


_SQL_BIGRAM = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(arr)),
                               i -> arr[i] || ' ' || arr[i + 1])) AS bigram
  FROM toks)
SELECT bigram, count(DISTINCT doc_id) AS df
FROM bi GROUP BY bigram HAVING count(DISTINCT doc_id) >= 10
"""


# ---------------------------------------------------------------------------
# 15. event-time tumbling window aggregation  (streaming analog, §2.9)


def q_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time window — the batch twin of the streaming
    rollup (streaming/ has the readStream version with watermark)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


_SQL_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# 16. sessionization via gap detection  (stateful-stream analog)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + conditional
    cumsum — the batch form of applyInPandasWithState session windows."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; NTZ→TS→long applies a constant tz offset that
    # cancels in the difference, so the 1800 s gap test matches epoch().
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_s = F.when(gap.isNull() | (gap <= 1800), F.lit(0)).otherwise(F.lit(1))
    sess = ev.withColumn("new_s", new_s).withColumn(
        "session_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id").agg(
        (F.max("session_id") + 1).alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


_SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events),
s AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g)
SELECT user_id, max(session_id) + 1 AS n_sessions, count(*) AS n_events
FROM s GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# registry (batch 1 — reference operator family)

QUERIES = {
    "q_pricing_summary": q_pricing_summary,
    "q_top5_orders": q_top5_orders,
    "q_semi_join_parts": q_semi_join_parts,
    "q_anti_join_seen": q_anti_join_seen,
    "q_politeness_admission": q_politeness_admission,
    "q_url_canonicalize": q_url_canonicalize,
    "q_url_validity": q_url_validity,
    "q_exact_dedup": q_exact_dedup,
    "q_rolling_hash": q_rolling_hash,
    "q_word_freq": q_word_freq,
    "q_doc_length": q_doc_length,
    "q_tfidf": q_tfidf,
    "q_search_top5": q_search_top5,
    "q_bigram_prune": q_bigram_prune,
    "q_hourly_events": q_hourly_events,
    "q_sessionize": q_sessionize,
}

ORACLE_SQL = {
    "q_pricing_summary": _SQL_PRICING,
    "q_top5_orders": _SQL_TOP5,
    "q_semi_join_parts": _SQL_SEMI,
    "q_anti_join_seen": _SQL_ANTI,
    "q_politeness_admission": _SQL_ADMISSION,
    "q_url_canonicalize": _SQL_CANON,
    "q_url_validity": _SQL_VALIDITY,
    "q_exact_dedup": _SQL_EXACT_DEDUP,
    "q_rolling_hash": _SQL_ROLLING,
    "q_word_freq": _SQL_WORD_FREQ,
    "q_doc_length": _SQL_DOC_LEN,
    "q_tfidf": _SQL_TFIDF,
    "q_search_top5": _SQL_SEARCH,
    "q_bigram_prune": _SQL_BIGRAM,
    "q_hourly_events": _SQL_HOURLY,
    "q_sessionize": _SQL_SESSIONIZE,
}
