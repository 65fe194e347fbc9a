"""Text extraction + tokenization as JVM Column expressions.

The crawler-side tokenizer (shared/tokenizer.py:27-46) is ASCII-
alphanumeric-run extraction + lowercase — expressible entirely in
codegen'd expressions ([A-Za-z0-9] in Java regex is ASCII-only, and
any non-ASCII char is a separator, exactly like the reference's
char-scan). Property-tested vs tests/oracle/reference_impl.py.

The indexer-side n-gram/stemming tokenizer needs Porter stemming and
nltk-boundary n-grams — that lives in functions/stemming.py +
plans/indexer.py as a pandas UDF (SURVEY U2/U3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def visible_text(content: Column) -> Column:
    """Page text as the crawler tokenizes it: drop the <head> block,
    strip tags (crawler/worker.py:93-95 removes head/title/style/
    script/td/tr/code — the synthetic corpus only ever has <head>)."""
    no_head = F.regexp_replace(content, r"(?si)<head>.*?</head>", " ")
    return F.regexp_replace(no_head, r"<[^>]+>", " ")


def char_scan_tokens(text: Column) -> Column:
    """shared/tokenizer.py:27-46: maximal ASCII-alnum runs, lowered."""
    return F.transform(
        F.regexp_extract_all(text, F.lit("[A-Za-z0-9]+"), F.lit(0)), F.lower
    )


def page_token_count(content: Column) -> Column:
    """Page 'length' = total token count (crawler/worker.py:98)."""
    return F.size(char_scan_tokens(visible_text(content))).cast("long")
