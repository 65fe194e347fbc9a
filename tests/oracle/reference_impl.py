"""Executable spec of the reference's algorithms (the parity oracle).

Pure-Python re-statement of the *semantics* of
KevinPNguy01/Web-Crawler-Search-Engine (read-only at /root/reference)
— used as ground truth by the parity tests. Each function cites the
reference lines whose behavior it specifies. This is an independent
implementation (stdlib only; the reference's bs4/nltk deps are
replaced by equivalent stdlib/own code where needed), NOT a copy.

The Spark engine must match these bit-for-bit (URL sets, schedules,
token counts) or to 1e-3 (tf-idf, SURVEY.md C8).
"""

from __future__ import annotations

import re
from urllib.parse import parse_qs, unquote, urlparse

# --------------------------------------------------------------------------
# URL canonicalization — semantics of web_crawler/utils/__init__.py:34-38
# --------------------------------------------------------------------------


def normalize_url(url: str) -> str:
    """lowercase -> percent-decode -> http://=>https:// (ALL occurrences,
    str.replace semantics) -> strip ALL trailing slashes (str.rstrip)."""
    u = unquote(url.lower()).replace("http://", "https://")
    return u.rstrip("/") if u.endswith("/") else u


def url_sha256_key(url: str) -> str:
    """Scheme-insensitive sha256 page key — utils/__init__.py:27-32."""
    import hashlib

    p = urlparse(url)
    blob = f"{p.netloc}/{p.path}/{p.params}/{p.query}/{p.fragment}"
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()


# --------------------------------------------------------------------------
# Validity predicates — semantics of web_crawler/utils/scraper.py:29-88
# --------------------------------------------------------------------------

# Extension blacklist regex — the exact literal from scraper.py:57-65
# (duplicated alternatives 'js'/'data' included, as in the reference).
EXT_BLACKLIST = re.compile(
    r".*\.(css|js|bmp|gif|jpe?g|ico|java|rb|json|xml|yaml"
    r"|png|tiff?|mid|mp2|mp3|mp4|sql|c|cpp|py|js|sh|ts"
    r"|wav|avi|mov|mpeg|ram|m4v|mkv|ogg|ogv|pdf|bat|yml"
    r"|ps|eps|tex|ppt|pptx|doc|docx|xls|xlsx|names|ps1|scss|sass"
    r"|data|dat|exe|bz2|tar|msi|bin|7z|psd|dmg|iso|nb|swift"
    r"|epub|dll|cnf|tgz|sha1|ppsx|txt|war|r|z|data|jsx|tsx"
    r"|thmx|mso|arff|rtf|jar|csv|bib|odc|php|data-original"
    r"|rm|smil|wmv|swf|wma|zip|rar|gz)$"
)

BLOCKED_PARAMS = {"ical", "share", "action", "ucinetid", "image"}
AFG_PARAM = re.compile(r"afg\d+_page_id")


def valid_scheme(scheme: str) -> bool:  # scraper.py:29-32
    return scheme in {"http", "https"}


def valid_domain(netloc: str, root_domains: list[str]) -> bool:  # scraper.py:34-38
    return any(netloc.endswith(d) for d in root_domains)


def valid_path(path: str) -> bool:  # scraper.py:40-65
    if not path:
        return True
    segs = path.strip("/").split("/")
    if len(segs) != len(set(segs)):
        return False
    if "doku.php" in segs:
        return False
    return not EXT_BLACKLIST.match(path.lower())


def valid_query(query: str) -> bool:  # scraper.py:67-77
    for param in parse_qs(query):
        if param in BLOCKED_PARAMS:
            return False
        if AFG_PARAM.match(param):
            return False
        if "filter" in param:
            return False
    return True


def is_valid(url: str, root_domains: list[str]) -> bool:  # scraper.py:79-88
    p = urlparse(url)
    return (
        valid_scheme(p.scheme)
        and valid_domain(p.netloc, root_domains)
        and valid_path(p.path)
        and valid_query(p.query)
    )


# --------------------------------------------------------------------------
# Tokenizers — semantics of shared/tokenizer.py
# --------------------------------------------------------------------------


def char_scan_tokens(text: str) -> list[str]:
    """ASCII-alphanumeric maximal runs, lowercased — tokenizer.py:27-46.

    A char is a token char iff it encodes to ASCII and isalnum();
    everything else (incl. any non-ASCII char) is a separator.
    """
    out: list[str] = []
    cur: list[str] = []
    for ch in text:
        ok = ch.isascii() and ch.isalnum()
        if ok:
            cur.append(ch)
        elif cur:
            out.append("".join(cur).lower())
            cur = []
    if cur:
        out.append("".join(cur).lower())
    return out


def word_frequencies(tokens: list[str]) -> dict[str, int]:
    """tokenizer.py:66-73."""
    freq: dict[str, int] = {}
    for t in tokens:
        freq[t] = freq.get(t, 0) + 1
    return freq


WORD_RE = re.compile(r"\b[a-zA-Z0-9]+\b")


def word_tokens(string: str) -> list[str]:
    """re.findall(r'\\b[a-zA-Z0-9]+\\b'); numeric tokens dropped when
    longer than 4 chars; lowercased — tokenizer.py:54."""
    return [
        t.lower() for t in WORD_RE.findall(string) if not t.isnumeric() or len(t) <= 4
    ]


def ngram_frequencies(
    strings: list[str], stem: bool = False, stemmer=None
) -> dict[str, int]:
    """Uni/bi/tri-gram counts over each string — tokenizer.py:50-63.

    Multi-grams survive only if >=1 member is non-numeric. n-grams are
    built within a string (nltk.ngrams semantics: no cross-string
    grams). ``stemmer`` is a callable token->token.
    """
    grams: list[tuple[str, ...]] = []
    for s in strings:
        toks = word_tokens(s)
        if stem and stemmer is not None:
            toks = [stemmer(t) for t in toks]
        grams.extend((t,) for t in toks)
        for n in (2, 3):
            for i in range(len(toks) - n + 1):
                g = tuple(toks[i : i + n])
                if any(not t.isnumeric() for t in g):
                    grams.append(g)
    freq: dict[str, int] = {}
    for g in grams:
        key = " ".join(g)
        freq[key] = freq.get(key, 0) + 1
    return freq


# --------------------------------------------------------------------------
# Rolling content hash — semantics of inverted_indexer/indexer/worker.py:131-142
# --------------------------------------------------------------------------


def rolling_hash(strings: list[str]) -> int:
    """h = (h*31 + ord(c)) mod 2^32 over ' '.join(strings)."""
    h = 0
    for ch in " ".join(strings):
        h = (h * 31 + ord(ch)) % (2**32)
    return h


# --------------------------------------------------------------------------
# tf-idf — semantics of inverted_indexer/indexer/__init__.py:188-198
# --------------------------------------------------------------------------


def tf_idf(tf: int, df: int, n_docs: int) -> float:
    import math

    return (1 + math.log(tf)) * math.log(n_docs / df)


def prune_rare_ngrams(token: str, df: int) -> bool:
    """Keep iff single word or df >= 10 — indexer/__init__.py:188-190."""
    return " " not in token or df >= 10
