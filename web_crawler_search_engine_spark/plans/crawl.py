"""The crawl engine: iterative batch rounds over frontier tables.

One ``run_round`` = one logical time-slice of the reference's
worker loop (web_crawler/crawler/frontier.py:84-135 +
crawler/worker.py:73-111), as pure DataFrame transformations:

  1. robots fetch for first-contact hosts (fetch-once semantics of
     frontier.py:98-110 — here an anti-join + append, P6)
  2. robots evaluation of newly-discovered URLs (can_fetch,
     frontier.py:111-114; denied => consumed-not-fetched)
  3. window-ranked politeness admission (P7, operators/scheduler.py)
  4. fetch join vs the corpus (the deterministic network, J5 —
     reference analog utils/download.py:4-18)
  5. link scrape -> validity -> canonicalize -> seen anti-join (X1)
     -> deterministic discovery_seq assignment
  6. token stats aggregation (A1-A3: the lock-guarded dict merge of
     crawler/worker.py:113-127 is exactly partial+final groupBy)
  7. snapshot commit (S7 — resumable, north_rule)

Parity: bit-for-bit equal to tests/oracle/simulator.RoundSim (same
per-round admitted sequences, same final seen set/statuses/lengths),
which in turn closes to the same URL-seen set as the single-worker
reference model. Verified in tests/parity/.

Scale notes (the 100 TB design):
  * The frontier is hash-bucketed by host (``bucket_frontier``) so
    the admission window shuffles host-locally round after round.
  * Admission is salted two-phase top-K — a Zipf-hot host never
    funnels its pending set through one task (operators/scheduler.py).
  * The fetch join keys on xxhash64(url) — uniformly distributed, no
    key skew regardless of host skew; AQE splits stragglers.
  * The seen-set anti-join gets a Bloom pre-filter (operators/seen.py)
    that prunes definite-unseen links before the shuffle; the exact
    anti-join stays authoritative (FPs must not drop URLs).
  * State updates are full-snapshot rewrites here; at 10^10 URLs the
    frontier update becomes an append-only status log + latest-wins
    compaction (SURVEY §7.7.7) — the SnapshotStore interface is the
    seam where that lands.
"""

from __future__ import annotations

import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import html as H
from ..functions import text as T
from ..functions import urls as U
from ..operators import seen as seen_ops
from ..operators.scheduler import (
    admit,
    assign_global_seq,
    assign_seq_within_parents,
    politeness_quota,
)
from ..schemas import FRONTIER
from ..sources.checkpoints import SnapshotStore


@dataclass
class CrawlConfig:
    root_domains: list[str]
    user_agent: str = "SPARK_CRAWLER"
    politeness: float = 0.5
    round_duration: float = 4.0
    salt_buckets: int = 16
    host_buckets: int = 32
    use_bloom: bool = True
    bloom_bits_per_key: int = 16


_FRONTIER_COLS = [f.name for f in FRONTIER.fields] + ["allowed"]


class CrawlJob:
    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        robots_src: DataFrame,
        config: CrawlConfig,
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.config = config
        ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="crawl_ckpt_")
        self.store = SnapshotStore(spark, ckpt)
        # the synthetic network: keyed by xxhash64(canonical url)
        self.corpus = corpus.persist()
        self.robots_src = robots_src
        self._allows = H.make_robots_allows(config.user_agent)
        self._delay = H.make_robots_delay(config.user_agent)
        self.frontier: DataFrame | None = None
        self.robots: DataFrame | None = None
        self.token_stats: DataFrame | None = None
        self.round: int = 0
        # next discovery_seq, tracked driver-side (refreshed from the
        # end-of-round stats action; None => recompute lazily)
        self._base: int | None = None
        # Bloom shard blobs, built once and updated incrementally per
        # round (P8 steady state); None => (re)build from the frontier
        self._seen_blobs: list[dict] | None = None

    # ------------------------------------------------------------------
    def start(self, seed_urls: list[str]) -> None:
        """Seed the frontier (S2 — frontier.py:32-37): canonicalize,
        first-occurrence dedup, discovery_seq = seed list position."""
        seeds = self.spark.createDataFrame(
            [(u, i) for i, u in enumerate(seed_urls)], "url string, seq long"
        )
        canon = seeds.select(
            U.canonicalize(F.col("url")).alias("url"), F.col("seq")
        )
        w = Window.partitionBy("url").orderBy("seq")
        deduped = canon.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") == 1
        )
        frontier = assign_global_seq(deduped.drop("_rn"), ["seq"], base=0).select(
            F.xxhash64("url").alias("url_key"),
            F.col("url"),
            U.netloc_of(F.col("url")).alias("host"),
            F.lit(0).alias("depth"),
            F.col("discovery_seq"),
            F.lit("pending").alias("status"),
            F.lit(0).cast("long").alias("length"),
            F.lit(0).alias("round"),
            F.lit(None).cast("boolean").alias("allowed"),
        )
        self.round = 0
        self._base = None
        empty_robots = self.spark.createDataFrame(
            [], "host string, fetched boolean, rules string, crawl_delay double, fetch_round int"
        )
        empty_stats = self.spark.createDataFrame([], "token string, count long")
        self._commit(frontier, empty_robots, empty_stats, admitted=None, metrics=None)

    def resume(self) -> int:
        """Restart from the latest published snapshot (S3 —
        frontier.py:42-62; north_rule checkpoint-resume)."""
        r = self.store.latest_round()
        if r is None:
            raise FileNotFoundError("no snapshot to resume from")
        self.round = r
        self._base = None
        self._seen_blobs = None
        self.frontier = self.store.load("frontier")
        self.robots = self.store.load("robots")
        self.token_stats = self.store.load("token_stats")
        return r

    # ------------------------------------------------------------------
    def _commit(self, frontier, robots, token_stats, admitted, metrics) -> None:
        cfg = self.config
        frontier = frontier.repartition(cfg.host_buckets, "host")
        tables = {
            "frontier": frontier,
            "robots": robots,
            "token_stats": token_stats,
        }
        if admitted is not None:
            tables["admitted"] = admitted
        if metrics is not None:
            tables["metrics"] = metrics
        self.store.commit(self.round, tables)
        self.frontier = self.store.load("frontier")
        self.robots = self.store.load("robots")
        self.token_stats = self.store.load("token_stats")

    # ------------------------------------------------------------------
    def run_round(self) -> dict:
        cfg = self.config
        r = self.round + 1
        pending = self.frontier.filter(F.col("status") == "pending")

        # 1. robots fetch-once for first-contact hosts (P6/J1/U6)
        new_hosts = (
            pending.select("host")
            .distinct()
            .join(self.robots.select("host"), "host", "left_anti")
        )
        fetched_robots = (
            new_hosts.join(F.broadcast(self.robots_src), "host", "left")
            .withColumn("crawl_delay", self._delay(F.col("rules")))
            .select(
                "host",
                F.lit(True).alias("fetched"),
                "rules",
                "crawl_delay",
                F.lit(r).alias("fetch_round"),
            )
        )
        robots = self.robots.unionByName(fetched_robots)

        # 2. evaluate can_fetch once per URL (F13/U4); persists in
        #    the 'allowed' column so each URL is evaluated exactly once
        fresh = pending.filter(F.col("allowed").isNull()).drop("allowed")
        known = pending.filter(F.col("allowed").isNotNull())
        evaluated = fresh.join(
            F.broadcast(robots.select("host", "rules")), "host", "left"
        ).withColumn("allowed", self._allows(F.col("rules"), F.col("url")))
        evaluated = evaluated.drop("rules")
        pending_eval = known.unionByName(evaluated.select(*_FRONTIER_COLS))

        denied = pending_eval.filter(~F.col("allowed")).withColumn(
            "status", F.lit("robots_denied")
        )
        candidates = pending_eval.filter(F.col("allowed"))

        # 3. politeness admission (P7/J2/O5)
        with_quota = candidates.join(
            F.broadcast(robots.select("host", "crawl_delay", "fetch_round")),
            "host",
            "left",
        ).withColumn(
            "quota",
            politeness_quota(
                F.col("crawl_delay"), cfg.politeness, cfg.round_duration
            )
            - F.when(F.col("fetch_round") == r, F.lit(1)).otherwise(F.lit(0)),
        )
        max_quota = int(cfg.round_duration // cfg.politeness)
        admitted = admit(
            with_quota.drop("crawl_delay", "fetch_round"),
            max_quota=max_quota,
            salt_buckets=cfg.salt_buckets,
        ).drop("quota")

        # 4. fetch join vs the corpus (J5) — keys are xxhash64(url):
        #    uniform, skew-free regardless of host skew
        corpus = self.corpus.select(
            F.col("url_key"),
            F.col("url").alias("_corpus_url"),
            F.col("content"),
            F.col("bytes"),
        )
        fetched = (
            admitted.join(corpus, "url_key", "left")
            .filter(F.col("_corpus_url").isNull() | (F.col("_corpus_url") == F.col("url")))
            .drop("_corpus_url")
        )
        # should_scrape gate (F9 — crawler/worker.py:53-71)
        head = F.substring(F.col("content"), 1, 256)
        scrapeable = fetched.filter(
            F.col("content").isNotNull()
            & (F.octet_length("content") >= 256)
            & (head.contains("<html") | head.contains("<HTML"))
        )
        scrapeable = scrapeable.persist()

        # 5. scrape -> validity -> canonicalize -> X1 seen-dedup
        raw_links = scrapeable.select(
            F.col("discovery_seq").alias("parent_seq"),
            (F.col("depth") + 1).alias("depth"),
            F.posexplode(H.extract_links(F.col("content"), F.col("url"))).alias(
                "pos", "raw_url"
            ),
        )
        valid = raw_links.filter(U.is_valid(F.col("raw_url"), cfg.root_domains))
        canon = valid.select(
            U.canonicalize(F.col("raw_url")).alias("url"), "parent_seq", "pos", "depth"
        ).withColumn("url_key", F.xxhash64("url"))
        # within-batch first-discovery-wins (frontier.py:137-146)
        w_first = Window.partitionBy("url_key").orderBy("parent_seq", "pos")
        batch_unique = (
            canon.withColumn("_rn", F.row_number().over(w_first))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # seen-set anti-join, Bloom-accelerated (X1/P8): the Bloom
        # pre-filter only skips definite-unseen keys; the exact
        # anti-join remains authoritative (FP-safe).
        seen_keys = self.frontier.select("url_key")
        if cfg.use_bloom:
            if self._seen_blobs is None:
                # first round or post-resume: one distributed build
                # from the ledger; every later round updates the blobs
                # incrementally (see end of run_round)
                self._seen_blobs = seen_ops.build_seen_filter_blobs(
                    seen_keys, "url_key", cfg.bloom_bits_per_key
                )
            unseen = seen_ops.anti_join_with_prebuilt(
                batch_unique, seen_keys, self._seen_blobs, "url_key"
            )
        else:
            unseen = batch_unique.join(seen_keys, "url_key", "left_anti")
        if self._base is None:
            mx = self.frontier.agg(F.max("discovery_seq")).collect()[0][0]
            self._base = (mx if mx is not None else -1) + 1
        base = self._base
        # parents are this round's admitted pages (budget-bounded) =>
        # the prefix-sum path; values identical to the global dense rank
        new_links = assign_seq_within_parents(
            unseen, "parent_seq", "pos", base=base
        ).select(
            "url_key",
            "url",
            U.netloc_of(F.col("url")).alias("host"),
            F.col("depth").cast("int"),
            "discovery_seq",
            F.lit("pending").alias("status"),
            F.lit(0).cast("long").alias("length"),
            F.lit(r).alias("round"),
            F.lit(None).cast("boolean").alias("allowed"),
        )

        # 6. token stats (A1-A3) + page lengths
        lengths = scrapeable.select(
            "url_key", T.page_token_count(F.col("content")).alias("_len")
        )
        fetched_rows = (
            admitted.join(lengths, "url_key", "left")
            .withColumn("length", F.coalesce(F.col("_len"), F.lit(0)).cast("long"))
            .withColumn("status", F.lit("fetched"))
            .withColumn("round", F.lit(r))
            .drop("_len")
        )
        round_tokens = (
            scrapeable.select(
                F.explode(T.char_scan_tokens(T.visible_text(F.col("content")))).alias(
                    "token"
                )
            )
            .groupBy("token")
            .agg(F.count("*").cast("long").alias("count"))
        )
        token_stats = (
            self.token_stats.unionByName(round_tokens)
            .groupBy("token")
            .agg(F.sum("count").cast("long").alias("count"))
        )

        # 7. frontier snapshot: disjoint union of untouched + updated
        untouched = self.frontier.filter(F.col("status") != "pending")
        admitted_keys = admitted.select("url_key")
        remaining = candidates.join(admitted_keys, "url_key", "left_anti")
        frontier_next = (
            untouched.select(*_FRONTIER_COLS)
            .unionByName(denied.select(*_FRONTIER_COLS))
            .unionByName(fetched_rows.select(*_FRONTIER_COLS))
            .unionByName(remaining.select(*_FRONTIER_COLS))
            .unionByName(new_links.select(*_FRONTIER_COLS))
        )

        admitted_log = admitted.select(
            F.lit(r).alias("round"), "host", "url", "discovery_seq"
        )
        # per-partition lineage + fetch metrics (north_rule)
        metrics = (
            fetched.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(
                F.count("*").alias("admitted"),
                F.count("content").alias("fetched"),
                F.coalesce(F.sum(F.octet_length("bytes")), F.lit(0)).alias(
                    "bytes_fetched"
                ),
            )
            .withColumn("round", F.lit(r))
        )

        self.round = r
        self._commit(frontier_next, robots, token_stats, admitted_log, metrics)
        scrapeable.unpersist()
        # one action yields both the termination counts and the next
        # discovery_seq base (no separate max-seq job next round)
        rows = (
            self.frontier.groupBy("status")
            .agg(F.count("*").alias("n"), F.max("discovery_seq").alias("mx"))
            .collect()
        )
        counts = {row["status"]: row["n"] for row in rows}
        if rows:
            self._base = max((row["mx"] or -1) for row in rows) + 1
        if cfg.use_bloom and self._seen_blobs is not None:
            # incremental ledger-filter update with this round's new
            # links (read back from the committed snapshot — no
            # recompute; volume is bounded by the round's discoveries)
            import numpy as np

            new_keys = (
                self.frontier.filter(
                    (F.col("round") == r) & (F.col("status") == "pending")
                )
                .select("url_key")
                .toPandas()["url_key"]
                .to_numpy(np.int64)
            )
            self._seen_blobs = seen_ops.update_seen_filter(
                self._seen_blobs, new_keys
            )
        return {"round": r, **counts}

    # ------------------------------------------------------------------
    def run(self, max_rounds: int = 1000) -> dict:
        info: dict = {}
        for _ in range(max_rounds):
            info = self.run_round()
            if info.get("pending", 0) == 0:
                break
        return info

    # -- parity-test accessors ---------------------------------------
    def admitted_sequences(self) -> dict[int, list[tuple[str, str]]]:
        """round -> [(host, url)] ordered by discovery_seq."""
        out: dict[int, list[tuple[str, str]]] = {}
        for rnd in self.store.rounds():
            m = self.store.manifest(rnd)
            if "admitted" not in m["tables"]:
                continue
            df = self.store.load("admitted", rnd)
            rows = df.orderBy("discovery_seq").collect()
            if rows:
                out[rows[0]["round"]] = [(x["host"], x["url"]) for x in rows]
        return out

    def final_state(self) -> dict[str, tuple[str, int]]:
        """url -> (status, length)."""
        return {
            row["url"]: (row["status"], row["length"])
            for row in self.frontier.collect()
        }
