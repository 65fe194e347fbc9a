"""URL canonicalization + validity predicates as JVM Column expressions.

Everything here stays inside whole-stage codegen — no Python in the
hot path. Semantics match the reference (cited per function) and are
property-tested against the stdlib-based oracle in
``tests/oracle/reference_impl.py``.

Scale note: these run once per *discovered link* (the widest fan-out
in the whole pipeline — every fetched page explodes into tens of
links), which is exactly why they must be codegen'd Column exprs and
not UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The exact extension-blacklist literal from the reference
# (web_crawler/utils/scraper.py:57-65), Java-regex compatible.
EXT_BLACKLIST_RE = (
    r"\.(css|js|bmp|gif|jpe?g|ico|java|rb|json|xml|yaml"
    r"|png|tiff?|mid|mp2|mp3|mp4|sql|c|cpp|py|js|sh|ts"
    r"|wav|avi|mov|mpeg|ram|m4v|mkv|ogg|ogv|pdf|bat|yml"
    r"|ps|eps|tex|ppt|pptx|doc|docx|xls|xlsx|names|ps1|scss|sass"
    r"|data|dat|exe|bz2|tar|msi|bin|7z|psd|dmg|iso|nb|swift"
    r"|epub|dll|cnf|tgz|sha1|ppsx|txt|war|r|z|data|jsx|tsx"
    r"|thmx|mso|arff|rtf|jar|csv|bib|odc|php|data-original"
    r"|rm|smil|wmv|swf|wma|zip|rar|gz)$"
)

BLOCKED_PARAMS = ["ical", "share", "action", "ucinetid", "image"]


def _try_url_decode(c: Column) -> Column:
    """try_url_decode with graceful fallback used by canonicalize/query.

    ``urllib.parse.unquote`` leaves malformed %-sequences untouched;
    ``url_decode`` raises. ``try_url_decode`` + coalesce reproduces the
    lenient behavior for fully-malformed strings (strings mixing valid
    and invalid escapes differ — property-tested; the crawl pipeline
    only ever feeds it wellformed-escape URLs).
    """
    return F.try_url_decode(c)


def canonicalize(url: Column) -> Column:
    """Reference ``normalize`` (web_crawler/utils/__init__.py:34-38):
    lowercase -> percent-decode -> replace ALL ``http://``->``https://``
    -> strip ALL trailing slashes.

    ``unquote`` does not decode '+', while ``url_decode`` decodes it to
    a space — '+' is pre-escaped to '%2b' to neutralize that.
    """
    lowered = F.lower(url)
    protected = F.replace(lowered, F.lit("+"), F.lit("%2b"))
    decoded = F.coalesce(_try_url_decode(protected), lowered)
    https = F.replace(decoded, F.lit("http://"), F.lit("https://"))
    return F.regexp_replace(https, r"/+$", "")


def url_key(canonical_url: Column) -> Column:
    """Frontier key per north_rule: xxhash64(canonical_url) — built-in,
    JVM-side, 64-bit."""
    return F.xxhash64(canonical_url)


def url_sha256(url: Column) -> Column:
    """Scheme-insensitive page hash (utils/__init__.py:27-32):
    sha256 over 'netloc/path/params/query/fragment'. ``urlparse``
    separates params (after ';' in the last path segment) — the
    synthetic corpus never uses params, so '' is used, matching."""
    return F.sha2(
        F.concat_ws(
            "/",
            F.coalesce(F.parse_url(url, F.lit("AUTHORITY")), F.lit("")),
            F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")),
            F.lit(""),
            F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit("")),
            F.coalesce(F.parse_url(url, F.lit("REF")), F.lit("")),
        ),
        256,
    )


def scheme_of(url: Column) -> Column:
    return F.lower(F.coalesce(F.parse_url(url, F.lit("PROTOCOL")), F.lit("")))


def netloc_of(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("AUTHORITY")), F.lit(""))


def path_of(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))


def query_of(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))


def is_valid_scheme(url: Column) -> Column:
    """scraper.py:29-32 — scheme in {http, https}."""
    return scheme_of(url).isin("http", "https")


def is_valid_domain(url: Column, root_domains: list[str]) -> Column:
    """scraper.py:34-38 — netloc endswith any configured root domain."""
    host = netloc_of(url)
    cond = F.lit(False)
    for d in root_domains:
        cond = cond | host.endswith(F.lit(d))
    return cond


def is_valid_path(url: Column) -> Column:
    """scraper.py:40-65 — no duplicate path segments, no doku.php,
    extension not blacklisted. Empty path is valid."""
    path = path_of(url)
    segs = F.split(F.regexp_replace(path, r"^/+|/+$", ""), "/")
    no_dups = F.size(segs) == F.size(F.array_distinct(segs))
    no_doku = ~F.array_contains(segs, F.lit("doku.php"))
    no_ext = ~F.lower(path).rlike(EXT_BLACKLIST_RE)
    return (path == F.lit("")) | (no_dups & no_doku & no_ext)


def is_valid_query(url: Column) -> Column:
    """scraper.py:67-77 — parse_qs semantics: a param counts only when
    it has '=' and a non-empty value; names are percent+plus-decoded.
    Invalid when any name is blocked, matches ^afg\\d+_page_id, or
    contains 'filter'."""
    q = query_of(url)
    kvs = F.split(q, "&")
    # parse_qsl keeps a pair iff it has '=' and a non-empty value
    # (split('=', 1); len==2 and value truthy).
    with_val = F.filter(
        kvs,
        lambda kv: (F.instr(kv, "=") > 0) & (F.length(kv) > F.instr(kv, "=")),
    )
    names = F.transform(
        with_val,
        lambda kv: F.coalesce(
            _try_url_decode(F.substring_index(kv, "=", 1)),
            F.replace(F.substring_index(kv, "=", 1), F.lit("+"), F.lit(" ")),
        ),
    )
    bad = F.exists(
        names,
        lambda n: n.isin(*BLOCKED_PARAMS)
        | n.rlike(r"^afg\d+_page_id")
        | n.contains("filter"),
    )
    return ~F.coalesce(bad, F.lit(False))


def is_valid(url: Column, root_domains: list[str]) -> Column:
    """scraper.py:79-88 — conjunction of all four predicates, applied
    to the RAW scraped URL (before canonicalization), exactly as the
    reference applies it (crawler/worker.py:87 via scraper.py:12)."""
    return (
        is_valid_scheme(url)
        & is_valid_domain(url, root_domains)
        & is_valid_path(url)
        & is_valid_query(url)
    )
