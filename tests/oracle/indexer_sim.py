"""Indexer + search oracle: independent pure-Python model of the
reference's index build (inverted_indexer/) and query scoring
(start_search_engine.py), regex-based where the engine is
HTMLParser-based (two implementations cross-validate on the corpus).

Reference quirk reproduced: webpage.get_text() decomposes <head>
in-place BEFORE Posting.get_postings reads the same soup, so title
text never reaches postings and the title boost never fires.
"""

from __future__ import annotations

import math
import re

from web_crawler_search_engine_spark.functions.stemming import stem_cached

from .reference_impl import ngram_frequencies, rolling_hash, word_tokens

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.DOTALL | re.IGNORECASE)
_HEAD_RE = re.compile(r"<head>.*?</head>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")
_WORD_RE = re.compile(r"\b[a-zA-Z0-9]+\b")

BOOSTS = [("h1", 10000), ("h2", 1000), ("h3", 100), ("strong", 10)]
_BOOST_RES = {
    t: re.compile(rf"<{t}[^>]*>(.*?)</{t}>", re.DOTALL | re.IGNORECASE)
    for t, _ in BOOSTS
}


def extract_doc(content: str, url: str):
    """-> (strings, title, boosts) with stripped_strings semantics."""
    titles = _TITLE_RE.findall(content)
    title = titles[-1].strip() if titles else url
    body = _HEAD_RE.sub(" ", content)
    strings = []
    for seg in _TAG_RE.split(body):
        s = seg.strip()
        if s:
            strings.append(re.sub(r"\s+", " ", s))
    boosts = {
        t: [_TAG_RE.sub("", m) for m in rx.findall(body)]
        for t, rx in _BOOST_RES.items()
    }
    return strings, title, boosts


def doc_postings(strings, boosts):
    """shared/posting.py:6-28 semantics."""
    stem = stem_cached()
    freq = ngram_frequencies(strings)
    for token, count in ngram_frequencies(strings, stem=True, stemmer=stem).items():
        freq.setdefault(token, count)
    for tag, weight in BOOSTS:
        for text in boosts.get(tag, ()):
            joined = " ".join(t.lower() for t in _WORD_RE.findall(text))
            tokset = set(ngram_frequencies([joined])) | set(
                ngram_frequencies([joined], stem=True, stemmer=stem)
            )
            for token in freq:
                if token in tokset:
                    freq[token] += weight - 1
    return freq


def build_index_oracle(pages: list[dict]):
    """pages: [{url, content}] -> (docs, postings)

    docs: {doc_id: (url, title)}; postings: {(token, doc_id): (tf, score)}
    Doc ids over url-ordered, size-gated pages; html gate + global
    first-wins rolling-hash dedup before posting extraction.
    """
    sized = [p for p in sorted(pages, key=lambda p: p["url"])
             if len(p["content"].encode("utf-8")) <= 10_000_000]
    seen_hashes: set[int] = set()
    docs: dict[int, tuple[str, str]] = {}
    raw: dict[int, dict[str, int]] = {}
    for doc_id, p in enumerate(sized):
        content = p["content"]
        if "<html" not in content[:1024].lower():
            continue
        strings, title, boosts = extract_doc(content, p["url"])
        h = rolling_hash([" ".join(strings)])
        if h in seen_hashes:
            continue
        seen_hashes.add(h)
        docs[doc_id] = (p["url"], title)
        raw[doc_id] = doc_postings(strings, boosts)
    n = len(docs)
    df: dict[str, int] = {}
    for freq in raw.values():
        for token in freq:
            df[token] = df.get(token, 0) + 1
    postings: dict[tuple[str, int], tuple[int, float]] = {}
    for doc_id, freq in raw.items():
        for token, tf in freq.items():
            d = df[token]
            if " " in token and d < 10:
                continue  # rare-n-gram prune (indexer/__init__.py:188-190)
            score = round((1 + math.log(tf)) * math.log(n / d), 3)
            postings[(token, doc_id)] = (tf, score)
    return docs, postings


def search_oracle(docs, postings, tokens: list[str], fallback: list[str], k=5):
    """A9 aggregate + O4 top-k with (score desc, doc_id asc) ties."""

    def run(toks):
        agg: dict[int, float] = {}
        for (token, doc_id), (_, score) in postings.items():
            if token in toks:
                agg[doc_id] = agg.get(doc_id, 0.0) + score
        return sorted(agg.items(), key=lambda x: (-x[1], x[0]))[:k]

    res = run(set(tokens))
    if not res:
        res = run(set(fallback))
    return res


def context_oracle(content: str, tokens: list[str]) -> str:
    """C10 snippet oracle (shared/webpage.py:55-65): body -> alnum
    words joined by spaces; for each query word IN ORDER take 300
    chars from its first lowercased occurrence — the reference loop
    overwrites, so the last matching word wins."""
    words = " ".join(tokens).split(" ")
    m = re.search(r"<body[^>]*>(.*)</body>", content, re.DOTALL)
    body = m.group(1) if m else content
    text = re.sub(r"<[^>]+>", " ", body)
    text = re.sub(r"[^a-zA-Z0-9]+", " ", text).strip()
    low = text.lower()
    ctx = ""
    for w in words:
        pos = low.find(w.lower())
        if pos > -1:
            ctx = text[pos : pos + 300]
    return ctx
