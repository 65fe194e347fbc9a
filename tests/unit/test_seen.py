"""JVM Bloom seen-set operator: correctness (no false negatives,
exact anti-join equality, incremental == bulk) and plan shape (the
whole probe/update path must stay inside codegen — zero Python
stages; the r1 pandas probe was the measured anti-scaling stage)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from web_crawler_search_engine_spark.operators import seen as S


@pytest.fixture(scope="module")
def frames(spark):
    seen = spark.range(0, 20_000).select(F.xxhash64("id").alias("url_key"))
    batch = spark.range(10_000, 45_000).select(
        F.xxhash64("id").alias("url_key"), F.col("id")
    )
    return seen.persist(), batch.persist()


def test_no_false_negatives(spark, frames):
    seen, _ = frames
    m = S.plan_m_bits(40_000, 16)
    words = S.bloom_word_updates(seen, "url_key", m)
    flagged = S.with_maybe_seen(seen, words, "url_key", m)
    assert flagged.filter(~F.col("_maybe")).count() == 0


def test_anti_join_equals_exact(spark, frames):
    seen, batch = frames
    m = S.plan_m_bits(40_000, 16)
    words = S.bloom_word_updates(seen, "url_key", m)
    unseen, handle = S.anti_join_via_bloom(batch, seen, words, "url_key", m)
    got = sorted(r["id"] for r in unseen.collect())
    want = sorted(
        r["id"]
        for r in batch.join(seen, "url_key", "left_anti").collect()
    )
    handle.unpersist()
    assert got == want == list(range(20_000, 45_000))


def test_incremental_update_equals_bulk_build(spark, frames):
    seen, batch = frames
    m = S.plan_m_bits(80_000, 16)
    a = S.bloom_word_updates(seen, "url_key", m)
    b = S.bloom_word_updates(batch.select("url_key"), "url_key", m)
    inc = {r["word_id"]: r["word"] for r in S.or_words(a, b).collect()}
    bulk = {
        r["word_id"]: r["word"]
        for r in S.bloom_word_updates(
            seen.unionByName(batch.select("url_key")), "url_key", m
        ).collect()
    }
    assert inc == bulk


def test_shuffle_probe_matches_broadcast_probe(spark, frames):
    """maybe_seen_keys (scale path: one partition-aligned join, no
    broadcast of the filter) and with_maybe_seen (broadcast probe)
    flag exactly the same key set."""
    seen, batch = frames
    m = S.plan_m_bits(40_000, 16)
    words = S.bloom_word_updates(seen, "url_key", m).persist()
    got = sorted(
        r["url_key"]
        for r in S.maybe_seen_keys(
            batch.select("url_key"), words, "url_key", m
        ).collect()
    )
    want = sorted(
        r["url_key"]
        for r in S.with_maybe_seen(batch, words, "url_key", m)
        .filter(F.col("_maybe"))
        .select("url_key")
        .distinct()
        .collect()
    )
    words.unpersist()
    assert got == want


def test_or_words_keeps_big_side_partitioning(spark, frames):
    """The incremental filter merge must not reshuffle the standing
    filter: or_words on a persisted groupBy output plans exactly one
    Exchange (the delta side)."""
    import re

    seen, batch = frames
    m = S.plan_m_bits(80_000, 16)
    words = S.bloom_word_updates(seen, "url_key", m).persist()
    words.count()
    delta = S.bloom_word_updates(batch.select("url_key"), "url_key", m)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        S.or_words(words, delta).explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]
    words.unpersist()
    # the join's big-side child is the cache directly (at most a Sort
    # in between) — any Exchange there would mean the standing filter
    # reshuffles every round
    assert re.search(
        r":- (Sort \(\d+\)\n\s*:\s*\+- )?InMemoryTableScan", tree
    ), tree


def test_probe_and_update_plans_have_no_python_stages(spark, frames):
    seen, batch = frames
    m = S.plan_m_bits(40_000, 16)
    words = S.bloom_word_updates(seen, "url_key", m)
    for df in (words, S.with_maybe_seen(batch, words, "url_key", m)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        assert "EvalPython" not in p, p  # no Batch/ArrowEvalPython nodes
    # probe is broadcast-join shaped: the batch is never shuffled
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        S.with_maybe_seen(batch, words, "url_key", m).explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p


def test_bloom_anti_join_randomized_property(spark):
    """Seeded randomized invariant sweep (batched — one combo per
    Spark job, per repo property-test convention): for random seen
    sets and batch mixes at several (bits_per_key, k) layouts —
    including deliberately UNDERSIZED filters where nearly every probe
    is a false positive — anti_join_via_bloom equals the plain exact
    anti-join. The Bloom is an accelerator; correctness must never
    depend on its sizing."""
    import random

    rng = random.Random(41)
    for bits, k in ((16, 3), (8, 2), (2, 3)):  # (2,3): FP-saturated
        n_seen = rng.randint(1, 3000)
        seen_keys = list(
            {rng.randint(-(2**62), 2**62) for _ in range(n_seen)}
        )
        overlap = rng.sample(seen_keys, rng.randint(0, len(seen_keys)))
        fresh = [rng.randint(-(2**62), 2**62) for _ in range(rng.randint(1, 2000))]
        batch_keys = list(dict.fromkeys(overlap + fresh))
        rng.shuffle(batch_keys)
        seen = spark.createDataFrame([(x,) for x in seen_keys], "url_key long")
        batch = spark.createDataFrame(
            [(x, i) for i, x in enumerate(batch_keys)], "url_key long, i long"
        )
        m = S.plan_m_bits(n_seen, bits)
        words = S.bloom_word_updates(seen, "url_key", m, k=k).persist()
        words.count()
        unseen, handle = S.anti_join_via_bloom(
            batch, seen, words, "url_key", m, k=k
        )
        got = sorted(r["url_key"] for r in unseen.collect())
        want = sorted(set(batch_keys) - set(seen_keys))
        handle.unpersist()
        words.unpersist()
        assert got == want, (bits, k, len(got), len(want))


def test_layered_probe_equals_merged_probe(spark, frames):
    """The base+delta two-layer probe (maybe_seen_keys
    delta_words=...) must flag exactly the keys the merged filter
    flags — including false positives, which the layered form must
    reproduce bit-for-bit because downstream admission order depends
    on the maybe set. Split the ledger 80/20 into base/delta layers
    and compare against or_words-merged, plus the saturation edges
    (empty delta, delta-only keys)."""
    seen, batch = frames
    m = S.plan_m_bits(40_000, 16)
    base_keys = seen.filter(F.pmod("url_key", F.lit(5)) != 0)
    delta_keys = seen.filter(F.pmod("url_key", F.lit(5)) == 0)
    base = S.bloom_word_updates(base_keys, "url_key", m).persist()
    delta = S.bloom_word_updates(delta_keys, "url_key", m).persist()
    merged = S.or_words(base, delta).persist()

    def keyset(words, dw=None):
        return sorted(
            r["url_key"]
            for r in S.maybe_seen_keys(
                batch.select("url_key"), words, "url_key", m, delta_words=dw
            ).collect()
        )

    assert keyset(base, delta) == keyset(merged)
    # delta-only keys must be caught by the delta layer alone
    empty = S.bloom_word_updates(
        seen.limit(0), "url_key", m
    )
    assert keyset(empty, delta) == keyset(delta)
    # a None delta is the plain single-layer probe
    assert keyset(base, None) == keyset(base)
    for d in (base, delta, merged):
        d.unpersist()


def test_layered_anti_join_equals_exact(spark, frames):
    """anti_join_via_bloom with a delta layer still equals the plain
    exact anti-join (the Bloom is only ever an accelerator)."""
    seen, batch = frames
    m = S.plan_m_bits(40_000, 16)
    base = S.bloom_word_updates(
        seen.filter(F.pmod("url_key", F.lit(3)) != 0), "url_key", m
    ).persist()
    delta = S.bloom_word_updates(
        seen.filter(F.pmod("url_key", F.lit(3)) == 0), "url_key", m
    ).persist()
    unseen, handle = S.anti_join_via_bloom(
        batch, seen, base, "url_key", m, delta_words=delta
    )
    got = sorted(r["id"] for r in unseen.select("id").collect())
    want = sorted(
        r["id"]
        for r in batch.join(seen, "url_key", "left_anti").select("id").collect()
    )
    handle.unpersist()
    base.unpersist()
    delta.unpersist()
    assert got == want
