"""Crawl-scheduler oracle: two executable models of the reference.

Model A — ``SingleWorkerSim``: the reference's scheduler semantics
(``web_crawler/crawler/frontier.py:84-135`` + worker loop
``crawler/worker.py:100-111``) under a *logical clock*: a single
worker drains a FIFO, rotating URLs whose host is on politeness
cooldown to the tail; robots.txt is fetched once per host and stamps
the host's clock (``frontier.py:75``); robots-denied URLs are consumed
without being fetched (``frontier.py:111-114``); each dispensed URL
advances the clock by the politeness delay (the ``sleep`` at
``worker.py:111``; download latency is 0 in the synthetic world).
Multi-threaded wall-clock order is nondeterministic, so this is the
golden deterministic schedule (SURVEY.md §3.1).

Model B — ``RoundSim``: the round-based contract the Spark engine
implements. Each round has logical duration T; host h may fetch at
most floor(T / max(crawl_delay_h, politeness)) URLs per round (minus
one on the host's first-contact round — the robots fetch consumes a
politeness slot, mirroring ``frontier.py:75``), in discovery order;
links found in round r become eligible in round r+1; robots-denied
pending URLs are consumed the round their host's rules are known.

Invariants tested (tests/parity/):
  * Spark engine == Model B bit-for-bit (per-round admitted sequences).
  * Model B run to exhaustion == Model A run to exhaustion on the
    final URL-seen set + statuses (the BFS closure is schedule-
    independent), and per-host fetch order == per-host discovery
    order in both (FIFO rotation preserves per-host relative order).
"""

from __future__ import annotations

import io
import math
import re
from dataclasses import dataclass, field
from urllib.parse import urldefrag, urljoin, urlparse
from urllib.robotparser import RobotFileParser

from .reference_impl import char_scan_tokens, is_valid, normalize_url

_HREF_RE = re.compile(r'<a\s[^>]*?href="([^"]*)"', re.IGNORECASE | re.DOTALL)


def sim_extract_links(content: str, base_url: str) -> list[str]:
    """Document-order <a href> extraction + urljoin + urldefrag
    (semantics of scraper.py:14-27). Regex-based: independent of the
    engine's HTMLParser-based extractor; they must agree on the
    well-formed synthetic corpus."""
    out = []
    for href in _HREF_RE.findall(content):
        out.append(urldefrag(urljoin(base_url, href))[0])
    return out


def parse_robots(rules: str | None) -> RobotFileParser:
    rp = RobotFileParser()
    rp.modified()
    if rules is not None:
        rp.parse(rules.splitlines())
    return rp


def should_scrape(status: int, content: bytes) -> bool:
    """crawler/worker.py:53-71."""
    if status != 200 or len(content) < 256:
        return False
    head = content[:256]
    return b"<HTML" in head or b"<html" in head


@dataclass
class SimResult:
    # per-host fetch order (normalized URLs, in dispense order)
    host_order: dict[str, list[str]] = field(default_factory=dict)
    # url -> status: 'fetched' | 'robots_denied' | 'pending'
    statuses: dict[str, str] = field(default_factory=dict)
    # url -> token count (0 when not scraped)
    lengths: dict[str, int] = field(default_factory=dict)
    # per-round admitted (round -> list[(host, url)]) — Model B only
    rounds: dict[int, list[tuple[str, str]]] = field(default_factory=dict)
    token_counts: dict[str, int] = field(default_factory=dict)

    @property
    def seen(self) -> set[str]:
        return set(self.statuses)


class _CrawlWorld:
    """Shared fetch/scrape logic over the synthetic corpus."""

    def __init__(
        self,
        corpus_by_url: dict[str, dict],
        robots_by_host: dict[str, str | None],
        root_domains: list[str],
        user_agent: str = "SPARK_CRAWLER",
        politeness: float = 0.5,
    ):
        self.corpus = corpus_by_url  # canonical url -> row dict (content,…)
        self.robots_src = robots_by_host
        self.roots = root_domains
        self.agent = user_agent
        self.politeness = politeness

    def fetch(self, url: str) -> tuple[int, str]:
        row = self.corpus.get(url)
        if row is None:
            return 404, ""
        return 200, row["content"]

    def scrape(self, url: str, content: str) -> tuple[list[str], dict[str, int], int]:
        """Returns (valid child urls in doc order, token freqs, length).

        Mirrors worker.process_url: scraper() then tokenize/count
        (worker.py:85-98). Token extraction uses the page's visible
        text; the synthetic corpus has no style/script/td/tr/code
        tags, so stripping tags is sufficient.
        """
        links = [
            u
            for u in sim_extract_links(content, url)
            if is_valid(u, self.roots)
        ]
        text = re.sub(r"<[^>]+>", " ", _drop_head(content))
        freqs: dict[str, int] = {}
        for t in char_scan_tokens(text):
            freqs[t] = freqs.get(t, 0) + 1
        return links, freqs, sum(freqs.values())


def _drop_head(content: str) -> str:
    """worker.py:94 extracts head/title/style/script/td/tr/code before
    tokenizing; the synthetic corpus only ever has a <head> block."""
    return re.sub(r"<head>.*?</head>", " ", content, flags=re.DOTALL | re.IGNORECASE)


class SingleWorkerSim(_CrawlWorld):
    """Model A — reference semantics under a logical clock."""

    def run(self, seed_urls: list[str], max_steps: int = 10**9) -> SimResult:
        res = SimResult()
        queue: list[str] = []
        robots: dict[str, RobotFileParser] = {}
        last: dict[str, float] = {}
        clock = 0.0

        def add(url: str):
            u = normalize_url(url)
            if u in res.statuses:
                return
            res.statuses[u] = "pending"
            res.lengths[u] = 0
            queue.append(u)

        for s in seed_urls:
            add(s)

        steps = 0
        stalled = 0  # consecutive rotations without a dispense
        while queue and steps < max_steps:
            url = queue.pop(0)
            host = urlparse(url).netloc
            if host not in robots:
                last[host] = clock  # stamped before fetch, frontier.py:75
                robots[host] = parse_robots(self.robots_src.get(host))
            rp = robots[host]
            if not rp.can_fetch(self.agent, url):
                res.statuses[url] = "robots_denied"
                stalled = 0
                continue
            cd = rp.crawl_delay(self.agent) or 0
            wait = max(cd, self.politeness)
            if host in last and clock - last[host] < wait:
                queue.append(url)
                stalled += 1
                if stalled >= len(queue):
                    # nothing dispensable: advance clock to earliest ready
                    clock = min(
                        last[urlparse(u).netloc]
                        + max(
                            robots[urlparse(u).netloc].crawl_delay(self.agent) or 0,
                            self.politeness,
                        )
                        for u in queue
                        if urlparse(u).netloc in last
                    )
                    stalled = 0
                continue
            # dispense
            stalled = 0
            last[host] = clock
            res.statuses[url] = "fetched"
            res.host_order.setdefault(host, []).append(url)
            status, content = self.fetch(url)
            if should_scrape(status, content.encode("utf-8")):
                links, freqs, length = self.scrape(url, content)
                for child in links:
                    add(child)
                res.lengths[url] = length
                for t, c in freqs.items():
                    res.token_counts[t] = res.token_counts.get(t, 0) + c
            clock += self.politeness  # worker sleep, worker.py:111
            steps += 1
        return res


class RoundSim(_CrawlWorld):
    """Model B — the round-based contract (what the Spark engine runs).

    ``recrawl_ttl`` (engine CrawlConfig.recrawl_ttl): a URL fetched in
    round f is EXPIRED from the seen set for any round r with
    f < r - ttl — rediscovering it then re-queues it with a fresh
    discovery_seq (and resets its length until refetched), exactly the
    engine's TTL liveness rule (_seen_keys: a key is seen unless its
    latest row is a fetch older than the window)."""

    def __init__(
        self,
        *args,
        round_duration: float = 4.0,
        recrawl_ttl: int | None = None,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.T = round_duration
        self.ttl = recrawl_ttl

    def run(self, seed_urls: list[str], max_rounds: int = 10**6) -> SimResult:
        res = SimResult()
        robots: dict[str, RobotFileParser] = {}
        # frontier: url -> (depth, discovery_seq); pending set mirrors status
        seq_of: dict[str, int] = {}
        fetched_round: dict[str, int] = {}
        next_seq = 0
        rnd = 0

        def add(url: str) -> None:
            nonlocal next_seq
            u = normalize_url(url)
            if u in res.statuses:
                expired = (
                    self.ttl is not None
                    and res.statuses[u] == "fetched"
                    and fetched_round.get(u, rnd) < rnd - self.ttl
                )
                if not expired:
                    return
            res.statuses[u] = "pending"
            res.lengths[u] = 0
            seq_of[u] = next_seq
            next_seq += 1

        for s in seed_urls:
            add(s)

        for rnd in range(1, max_rounds + 1):
            pending = sorted(
                (u for u, st in res.statuses.items() if st == "pending"),
                key=lambda u: seq_of[u],
            )
            if not pending:
                break
            # robots fetch for first-contact hosts
            new_hosts = set()
            for u in pending:
                h = urlparse(u).netloc
                if h not in robots:
                    new_hosts.add(h)
            for h in new_hosts:
                robots[h] = parse_robots(self.robots_src.get(h))
            # consume denied, admit within per-host quota
            admitted: list[str] = []
            used: dict[str, int] = {}
            for u in pending:
                h = urlparse(u).netloc
                rp = robots[h]
                if not rp.can_fetch(self.agent, u):
                    res.statuses[u] = "robots_denied"
                    continue
                cd = rp.crawl_delay(self.agent) or 0
                quota = int(self.T // max(cd, self.politeness))
                if h in new_hosts:
                    quota = max(0, quota - 1)
                if used.get(h, 0) < quota:
                    used[h] = used.get(h, 0) + 1
                    admitted.append(u)
            res.rounds[rnd] = [(urlparse(u).netloc, u) for u in admitted]
            # fetch + scrape; children eligible next round
            for u in admitted:
                res.statuses[u] = "fetched"
                fetched_round[u] = rnd
                res.host_order.setdefault(urlparse(u).netloc, []).append(u)
                status, content = self.fetch(u)
                if should_scrape(status, content.encode("utf-8")):
                    links, freqs, length = self.scrape(u, content)
                    for child in links:
                        add(child)
                    res.lengths[u] = length
                    for t, c in freqs.items():
                        res.token_counts[t] = res.token_counts.get(t, 0) + c
        return res
