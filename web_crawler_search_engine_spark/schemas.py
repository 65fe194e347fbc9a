"""Fixed StructType schemas for every engine table.

The reference is schemaless (dicts + JSON files; the single declared
schema is ``shared/webpage.py:14-20``). Here every table has one
authoritative schema, declared once (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# D5/T1 — the synthetic web: one image+caption row per page
# (authoritative column set from BASELINE.json input_hint).
CORPUS = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
        # derived-at-generation columns (the link-graph sidecar):
        StructField("url", StringType(), False),
        StructField("url_key", LongType(), False),
        StructField("host", StringType(), False),
        StructField("content", StringType(), True),  # HTML-ish page body
    ]
)

# D1+D2+D7 — frontier / URL-seen ledger (reference: frontier.py:20-21,
# frontier.json).  status: pending | fetched | robots_denied.
FRONTIER = StructType(
    [
        StructField("url_key", LongType(), False),
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("discovery_seq", LongType(), False),
        StructField("status", StringType(), False),
        StructField("length", LongType(), False),
        StructField("round", IntegerType(), False),  # round admitted/discovered
    ]
)

# D4/T3 — per-host robots rules (reference: frontier.py:26,64-82).
ROBOTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("fetched", BooleanType(), False),
        StructField("rules", StringType(), True),  # raw robots.txt text
        StructField("crawl_delay", DoubleType(), True),
        StructField("fetch_round", IntegerType(), False),
    ]
)

# D5/T4 — fetched pages (image payload carried through).
PAGES = StructType(
    [
        StructField("url_key", LongType(), False),
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("content", StringType(), True),
        StructField("image_id", StringType(), True),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
        StructField("round", IntegerType(), False),
    ]
)

# D10/T4 — document metadata (reference: crawled.txt,
# indexer/__init__.py:136-160).
DOCS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("url", StringType(), False),
        StructField("title", StringType(), True),
    ]
)

# D8/D9/T4 — inverted index postings (reference text format:
# indexer/worker.py:66-73; tf-idf at indexer/__init__.py:192-198).
POSTINGS = StructType(
    [
        StructField("token", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("tf", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)

# per-round, per-partition lineage + metrics (north_rule requirement).
METRICS = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("admitted", LongType(), False),
        StructField("fetched", LongType(), False),
        StructField("robots_denied", LongType(), False),
        StructField("new_urls", LongType(), False),
        StructField("bytes_fetched", LongType(), False),
    ]
)

# token frequency stats (D6; reference frontier.py:29).
TOKEN_STATS = StructType(
    [
        StructField("token", StringType(), False),
        StructField("count", LongType(), False),
    ]
)

SEEDS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("seq", LongType(), False),
    ]
)
