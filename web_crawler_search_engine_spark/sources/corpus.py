"""Deterministic synthetic-web generator (FIXTURES.md T1/T3/T5).

Builds the image+caption corpus that plays the role of the network:
each row is one "page" whose URL is derived from (host, image_id) and
whose HTML body links to other rows' URLs (the fetch join resolves a
URL to its row — the deterministic stand-in for
``web_crawler/utils/download.py:4-18``).

Everything is seeded (numpy RandomState + python Random); no wall
clock. Hosts follow a Zipf(s=1.2) distribution so hot-host skew is
visible in the scheduler and fetch join (SURVEY.md §7.7.4). Link
hrefs are emitted in adversarial variant forms (mixed case, http://,
trailing slash, percent-encoding, relative, fragment) so that
canonicalization + the URL-seen set are genuinely exercised, plus
invalid sprinkles that hit every predicate branch of
``web_crawler/utils/scraper.py:29-88``.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import numpy as np

from ..images import codec

ROOT_DOMAINS = [".example.test"]
USER_AGENT = "SPARK_CRAWLER"
POLITENESS = 0.5

_WORDS = (
    "apple bridge circuit dawn ember forest granite harbor island jungle "
    "kernel lantern meadow nebula orchard prairie quartz river summit tundra "
    "umbra valley willow xenon yonder zephyr anchor beacon canyon delta "
    "engine falcon glacier horizon ingot jasper krypton lumen marble nectar "
    "onyx pylon quiver raven sparrow thicket urchin vertex wharf yarrow "
    "amber basalt cobalt dune estuary fjord grove heath inlet knoll lagoon "
    "mesa nook oasis plateau reef shoal terrace upland vale woodland"
).split()

_FILLER = (
    "the crawler walks the synthetic web politely one host at a time "
    "while captions describe small seeded images of pure noise"
).split()


@dataclass
class SynthWorld:
    rows: list[dict]  # full corpus rows (url, host, content, image cols)
    robots: dict[str, str | None] = field(default_factory=dict)
    seeds: list[str] = field(default_factory=list)
    root_domains: list[str] = field(default_factory=lambda: list(ROOT_DOMAINS))
    user_agent: str = USER_AGENT
    politeness: float = POLITENESS

    def by_url(self) -> dict[str, dict]:
        return {r["url"]: r for r in self.rows}


def _zipf_host_ids(rng: np.random.RandomState, n: int, hosts: int) -> np.ndarray:
    ranks = np.arange(1, hosts + 1, dtype=np.float64)
    p = 1.0 / ranks**1.2
    p /= p.sum()
    return rng.choice(hosts, size=n, p=p)


def _variant(url: str, host: str, image_id: str, kind: int) -> str:
    """Emit a link in one of several forms that all canonicalize to
    ``url`` (normalize semantics: utils/__init__.py:34-38)."""
    if kind == 0:
        return url
    if kind == 1:
        return url.replace("https://", "http://")
    if kind == 2:
        return url.upper().replace("HTTPS", "https")  # mixed case
    if kind == 3:
        return url + "/"
    if kind == 4:
        return url.replace("img", "im%67", 1)  # percent-encoded path
    if kind == 5:
        return f"/{image_id}"  # relative — resolved via urljoin
    return url + "#section-2"  # fragment — stripped via urldefrag


_INVALID_LINKS = [
    "ftp://h0.example.test/img00000000",  # bad scheme
    "https://evil.other.org/img00000000",  # foreign domain
    "https://h0.example.test/a/b/a",  # duplicate path segments
    "https://h0.example.test/doku.php/x",  # doku.php
    "https://h0.example.test/file.pdf",  # blacklisted extension
    "https://h0.example.test/file.tar.gz",
    "https://h0.example.test/p?ical=1",  # blocked query param
    "https://h0.example.test/p?afg3_page_id=7",
    "https://h0.example.test/p?prefilter=x",
]


_WORLD_CACHE: dict[tuple, "SynthWorld"] = {}


def generate_world(
    n: int = 300,
    hosts: int = 8,
    seed: int = 42,
    fanout: int = 6,
    with_images: bool = True,
    image_dim_choices: tuple[int, ...] = (32, 64),
    dup_frac: float = 0.08,
) -> SynthWorld:
    """Build the deterministic synthetic web.

    Memoized per parameter tuple: the generator is pure (seeded), the
    catalog's image queries re-request the same world, and the real
    JPEG codec makes generation seconds-scale — callers must treat
    the returned world as read-only (every call site builds a
    DataFrame from it and never mutates rows).

    ``dup_frac`` of rows are near-clones of an earlier row: identical
    visible text (same content-hash — X2 dedup) and identical pixels
    (same phash — X3 dedup) under their own URL.
    """
    cache_key = (
        n, hosts, seed, fanout, with_images, tuple(image_dim_choices),
        dup_frac,
    )
    cached = _WORLD_CACHE.get(cache_key)
    if cached is not None:
        return cached
    rng = np.random.RandomState(seed)
    pyr = random.Random(seed)
    host_ids = _zipf_host_ids(rng, n, hosts)

    rows: list[dict] = []
    for i in range(n):
        image_id = f"img{i:08d}"
        host = f"h{host_ids[i]}.example.test"
        url = f"https://{host}/{image_id}"
        dup_of = None
        if i > 10 and pyr.random() < dup_frac:
            dup_of = rows[pyr.randrange(len(rows))]
        if dup_of is not None:
            w, h, fmt = dup_of["w"], dup_of["h"], dup_of["fmt"]
            caption, title = dup_of["caption"], dup_of["title"]
            pixels = dup_of["_pixels"]
        else:
            w = int(pyr.choice(image_dim_choices))
            h = int(pyr.choice(image_dim_choices))
            fmt = pyr.choice(["png", "jpeg"])
            caption = " ".join(pyr.choices(_WORDS, k=pyr.randint(8, 14)))
            title = " ".join(pyr.choices(_WORDS, k=pyr.randint(2, 4)))
            pixels = (
                rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
                if with_images
                else None
            )
        blob = phash = None
        if pixels is not None:
            blob = codec.encode(pixels, fmt)
            phash = codec.phash64(codec.decode(blob, fmt))
        rows.append(
            {
                "image_id": image_id,
                "bytes": bytearray(blob) if blob is not None else None,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": caption,
                "phash": phash,
                "url": url,
                "host": host,
                "title": title,
                "_pixels": pixels,
                "dup_of": dup_of["url"] if dup_of else None,
            }
        )

    # link graph: document-order hrefs with adversarial variants.
    # Dup rows mirror their source page's ENTIRE content (identical
    # visible text incl. anchor labels => identical rolling content
    # hash, X2; identical pixels => identical phash, X3).
    by_url = {r["url"]: r for r in rows}
    for i, row in enumerate(rows):
        if row["dup_of"] is not None:
            row["content"] = by_url[row["dup_of"]]["content"]
            continue
        k = pyr.randint(max(1, fanout - 2), fanout + 2)
        targets = [rows[pyr.randrange(n)] for _ in range(k)]
        anchors = []
        for t in targets:
            kind = pyr.randint(0, 6)
            if kind == 5 and t["host"] != row["host"]:
                kind = 0  # relative links only resolve on the same host
            href = _variant(t["url"], t["host"], t["image_id"], kind)
            label = " ".join(pyr.choices(_WORDS, k=2))
            anchors.append(f'<a href="{href}">{label}</a>')
        if pyr.random() < 0.5:
            anchors.append(f'<a href="{pyr.choice(_INVALID_LINKS)}">bad link</a>')
        strong = pyr.choice(row["caption"].split())
        filler = " ".join(pyr.choices(_FILLER, k=30))
        row["content"] = (
            f"<html><head><title>{row['title']}</title></head><body>"
            f"<h1>{row['title']}</h1><p>{row['caption']}</p>"
            f"<strong>{strong}</strong><p>{filler}</p>"
            f"{''.join(anchors)}</body></html>"
        )
    for row in rows:
        row.pop("_pixels", None)

    # a couple of pages that fail should_scrape (tiny / non-HTML)
    if n >= 20:
        rows[n - 1]["content"] = "<html><body>tiny</body></html>"  # < 256 bytes
        rows[n - 2]["content"] = "plain text, no html tag " * 20  # no <html>

    # robots: host 1 disallows a path prefix; host 2 sets crawl-delay;
    # host 3 has no robots.txt at all (None => permissive default)
    robots: dict[str, str | None] = {}
    for hid in range(hosts):
        hname = f"h{hid}.example.test"
        if hid == 1:
            robots[hname] = "User-agent: *\nDisallow: /img0000001\n"
        elif hid == 2:
            robots[hname] = "User-agent: *\nCrawl-delay: 2\n"
        elif hid == 3:
            robots[hname] = None
        else:
            robots[hname] = "User-agent: *\nDisallow:\n"

    seeds = [rows[0]["url"], rows[min(5, n - 1)]["url"], rows[min(17, n - 1)]["url"]]
    world = SynthWorld(rows=rows, robots=robots, seeds=seeds)
    _WORLD_CACHE[cache_key] = world
    return world


def corpus_df(spark, world: SynthWorld):
    """World -> Spark DataFrame with the CORPUS schema (url_key added
    JVM-side via xxhash64)."""
    from pyspark.sql import functions as F

    from ..schemas import CORPUS

    data = [
        (
            r["image_id"],
            bytes(r["bytes"]) if r["bytes"] is not None else None,
            r["w"],
            r["h"],
            r["fmt"],
            r["caption"],
            r["phash"],
            r["url"],
            0,  # url_key placeholder
            r["host"],
            r["content"],
        )
        for r in world.rows
    ]
    df = spark.createDataFrame(data, CORPUS)
    return df.withColumn("url_key", F.xxhash64("url"))


def robots_src_df(spark, world: SynthWorld):
    """Host -> raw robots.txt rules (None = no robots.txt, permissive).
    This is the synthetic 'network' the robots fetcher joins against."""
    data = [(h, rules) for h, rules in world.robots.items()]
    return spark.createDataFrame(data, "host string, rules string")
