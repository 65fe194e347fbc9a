"""Interleaved same-JVM A/B of the Bloom maybe-probe shapes.

The guest's identical runs swing up to 2x across minutes, so probe
implementations are compared the way the seq-assign A/B was: both
shapes alternate inside ONE JVM over the SAME cached inputs, several
pairs, and the decision metric is the per-shape MIN.

Shapes:
  vote  — the engine's shape (operators/seen.maybe_seen_keys): k
          probe rows per key through one left join, then a
          groupBy(key) all-bits vote.
  chain — k sequential filtered left joins; a key stops probing at
          its first missed bit. Measured a DEAD HEAT with vote
          (mins 5.07 vs 5.11 s at 24M/4.8M, mixed per-pair), so the
          engine keeps vote (one fewer stage barrier); kept here as
          the refutation record. A third shape — build-side flip,
          survivors as SHJ build so the filter never hashes — was
          2.6x worse (it re-streams the word table k times) and is
          recorded in the seen.py docstring.

Usage: python tools/probe_ab.py [n_keys] [delta] [pairs]
Writes one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from web_crawler_search_engine_spark.operators import seen as seen_ops  # noqa: E402
from web_crawler_search_engine_spark.operators.seen import (  # noqa: E402
    _probe_positions,
)


def probe_chain(
    batch_keys: DataFrame,
    words: DataFrame,
    key_col: str,
    m_bits: int,
    k: int = 3,
    delta_words: DataFrame | None = None,
) -> DataFrame:
    """The refuted sequential shape, kept verbatim for the A/B."""
    positions = _probe_positions(F.col(key_col), k, m_bits)
    surv = batch_keys.select(key_col)
    d = (
        delta_words.select("word_id", F.col("word").alias("_dword"))
        if delta_words is not None
        else None
    )
    for pos in positions:
        probe = surv.select(
            F.col(key_col),
            F.shiftrightunsigned(pos, 6).alias("word_id"),
            (pos % 64).cast("int").alias("_bit"),
        )
        joined = probe.join(words.hint("shuffle_hash"), "word_id", "left")
        if d is not None:
            joined = joined.join(d.hint("shuffle_hash"), "word_id", "left")
            merged = "coalesce(word, 0L) | coalesce(_dword, 0L)"
        else:
            merged = "coalesce(word, 0L)"
        surv = joined.filter(
            F.expr(f"(shiftrightunsigned({merged}, _bit) & 1) = 1")
        ).select(key_col)
    return surv.distinct()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    delta = int(sys.argv[2]) if len(sys.argv) > 2 else 4_800_000
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    import bench  # reuse synth_frontier / session conventions

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("probe_ab")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .config(
            "spark.driver.extraJavaOptions",
            "-Xms16g -XX:+AlwaysPreTouch -XX:+UseParallelGC",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    hosts = max(int(n**0.5) // 4, 16)
    seen = (
        bench.synth_frontier(spark, n, hosts, "seenset")
        .select("url_key")
        .persist(StorageLevel.MEMORY_ONLY)
    )
    seen.count()
    m_bits = seen_ops.plan_m_bits(2 * n, 16)
    words = seen_ops.bloom_word_updates(seen, "url_key", m_bits).persist(
        StorageLevel.MEMORY_ONLY
    )
    words.count()
    accum = seen_ops.bloom_word_updates(
        bench.synth_frontier(spark, 4 * delta, hosts, "accumset").select(
            "url_key"
        ),
        "url_key",
        m_bits,
    ).persist(StorageLevel.MEMORY_ONLY)
    accum.count()
    d_fresh = delta * 7 // 12
    d_dup = delta - d_fresh
    batch = (
        bench.synth_frontier(spark, d_fresh, hosts, "delta")
        .select("url_key")
        .unionByName(
            bench.synth_frontier(spark, n, hosts, "seenset")
            .filter(F.col("discovery_seq") < d_dup)
            .select("url_key")
        )
        .persist(StorageLevel.MEMORY_ONLY)
    )
    batch.count()

    shapes = {
        "vote": lambda: seen_ops.maybe_seen_keys(
            batch, words, "url_key", m_bits, delta_words=accum
        ),
        "chain": lambda: probe_chain(
            batch, words, "url_key", m_bits, delta_words=accum
        ),
    }
    times: dict[str, list[float]] = {s: [] for s in shapes}
    counts: dict[str, int] = {}
    for p in range(pairs):
        # alternate the order inside each pair so drift biases neither
        order = ["vote", "chain"] if p % 2 == 0 else ["chain", "vote"]
        for s in order:
            t0 = time.monotonic()
            counts[s] = shapes[s]().count()
            dt = round(time.monotonic() - t0, 3)
            times[s].append(dt)
            print(f"[ab] pair {p} {s}: {dt:.1f}s", file=sys.stderr)
    out = {
        "n": n,
        "delta": delta,
        "m_bits": m_bits,
        "pairs": pairs,
        "times": times,
        "min": {s: min(t) for s, t in times.items()},
        "maybe_counts": counts,
        "agree": len(set(counts.values())) == 1,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
