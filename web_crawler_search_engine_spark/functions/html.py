"""Arrow-batched pandas UDFs for the Python-parity surface (SURVEY §2.10).

Only the operations whose semantics are defined by Python stdlib
behavior live here (HTML link extraction with urljoin/urldefrag,
robots.txt evaluation via urllib.robotparser). Everything else in the
crawl path is JVM Column expressions.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urldefrag, urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, DoubleType, StringType


class _LinkCollector(HTMLParser):
    """Collect <a href> values in document order — the semantics of
    the reference's BeautifulSoup find_all('a', href=True)
    (web_crawler/utils/scraper.py:14-27), stdlib-only."""

    def __init__(self):
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    break


def _extract_links_one(content: str | None, base_url: str | None) -> list[str]:
    if not content or not base_url:
        return []
    p = _LinkCollector()
    try:
        p.feed(content)
    except Exception:
        return []
    return [urldefrag(urljoin(base_url, h))[0] for h in p.hrefs]


@F.pandas_udf(ArrayType(StringType()))
def extract_links(content: pd.Series, base_url: pd.Series) -> pd.Series:
    """U1-lite: resolved, fragment-stripped links in document order."""
    return pd.Series(
        [_extract_links_one(c, u) for c, u in zip(content, base_url)]
    )


def _parser_cache(rules_iter):
    """Parse each distinct rules blob once per Arrow batch."""
    from urllib.robotparser import RobotFileParser

    cache: dict[str | None, RobotFileParser] = {}

    def get(rules: str | None) -> RobotFileParser:
        key = rules
        rp = cache.get(key)
        if rp is None:
            rp = RobotFileParser()
            rp.modified()
            if rules is not None and not (isinstance(rules, float)):
                rp.parse(str(rules).splitlines())
            cache[key] = rp
        return rp

    return get


def make_robots_allows(user_agent: str):
    """U4: can_fetch(agent, url) with exact urllib.robotparser
    semantics (frontier.py:111-114). Parser construction is amortized
    per distinct rules blob per batch (one per host)."""

    @F.pandas_udf(BooleanType())
    def robots_allows(rules: pd.Series, url: pd.Series) -> pd.Series:
        get = _parser_cache(rules)
        out = [
            get(None if r is None else r).can_fetch(user_agent, u)
            for r, u in zip(rules.where(rules.notna(), None), url)
        ]
        return pd.Series(out)

    return robots_allows


def make_robots_delay(user_agent: str):
    """U4: crawl_delay(agent) -> double or null (frontier.py:116-119)."""

    @F.pandas_udf(DoubleType())
    def robots_delay(rules: pd.Series) -> pd.Series:
        get = _parser_cache(rules)
        out = []
        for r in rules.where(rules.notna(), None):
            d = get(None if r is None else r).crawl_delay(user_agent)
            out.append(float(d) if d is not None else None)
        return pd.Series(out, dtype="float64")

    return robots_delay
