"""Bucketed on-disk seen-ledger (sources/ledger.py): the exact
backstop's CUTOVER path must never shuffle the ledger.

Plan-shape locks, same discipline as
tests/e2e/test_index_search.py's PartitionFilters lock:

  * an equi-anti-join against the bucketed ledger plans with exactly
    ONE Exchange — on the batch side (the ledger scan reports
    ``Bucketed: true`` and is never re-partitioned);
  * post-compaction (one sorted file per bucket) the ledger side is
    also sort-FREE;
  * appends accumulate files per bucket without losing the
    exchange-free property; compaction folds back to one file per
    bucket and preserves the row set.

Reference analog: web_crawler/crawler/frontier.py:137-146 persists
the in-process seen set; at 10^10 keys the equivalent table's
PHYSICAL layout is what keeps membership joins O(batch).
"""

from __future__ import annotations

import glob
import os
import re

import pytest
from pyspark.sql import functions as F

from web_crawler_search_engine_spark.operators.seen import (
    anti_join_via_bloom,
    bloom_word_updates,
    plan_m_bits,
)
from web_crawler_search_engine_spark.sources.ledger import (
    compact_bucketed_ledger,
    read_bucketed_ledger,
    retire_ledger_version,
    write_bucketed_ledger,
)

BUCKETS = 16


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _node_names(plan: str) -> list[str]:
    return [
        m.group(1)
        for line in plan.splitlines()
        if (m := re.match(r"\s*\(\d+\) (\w[\w ]*\w)", line))
    ]


@pytest.fixture()
def no_broadcast(spark):
    """Force the non-broadcast (cutover-shaped) join strategy."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture()
def ledger(spark, tmp_path):
    keys = spark.range(0, 100_000).select(F.xxhash64("id").alias("url_key"))
    path = str(tmp_path / "ledger")
    write_bucketed_ledger(keys, "t_seen_ledger", path, buckets=BUCKETS)
    yield read_bucketed_ledger(spark, "t_seen_ledger"), path
    spark.sql("DROP TABLE IF EXISTS t_seen_ledger")


def test_anti_join_never_shuffles_the_ledger(spark, ledger, no_broadcast):
    lt, _ = ledger
    batch = spark.range(50_000, 150_000).select(
        F.xxhash64("id").alias("url_key")
    )
    j = batch.join(lt, "url_key", "left_anti")
    plan = _formatted_plan(j)
    assert "Bucketed: true" in plan
    # exactly one Exchange node in the whole plan: the batch side
    # moving into the ledger's bucket layout
    assert _node_names(plan).count("Exchange") == 1
    # correctness: identical to the anti-join against the raw rows
    expected = (
        batch.join(lt.hint("broadcast"), "url_key", "left_anti").count()
    )
    assert j.count() == expected == 50_000


def test_compacted_ledger_joins_sort_free(spark, ledger, no_broadcast):
    lt, path = ledger
    # the overwrite writer already leaves one sorted file per bucket
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == BUCKETS
    batch = spark.range(90_000, 120_000).select(
        F.xxhash64("id").alias("url_key")
    )
    nodes = _node_names(_formatted_plan(batch.join(lt, "url_key", "left_anti")))
    assert nodes.count("SortMergeJoin") == 1
    # one Sort only — the batch side; the ledger streams pre-sorted
    assert nodes.count("Sort") == 1


def test_append_then_compact_preserves_rows_and_layout(
    spark, ledger, no_broadcast
):
    lt, path = ledger
    delta = spark.range(1_000_000, 1_050_000).select(
        F.xxhash64("id").alias("url_key")
    )
    write_bucketed_ledger(
        delta, "t_seen_ledger", path, buckets=BUCKETS, mode="append"
    )
    lt = read_bucketed_ledger(spark, "t_seen_ledger")
    assert lt.count() == 150_000
    # multi-file buckets: still exchange-free (a per-read sort is the
    # only cost until compaction)
    probe = spark.range(0, 10).select(F.xxhash64("id").alias("url_key"))
    plan = _formatted_plan(probe.join(lt, "url_key", "left_semi"))
    assert "Bucketed: true" in plan
    assert _node_names(plan).count("Exchange") == 1
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 2 * BUCKETS

    # versioned compaction: the new copy lands beside the live one,
    # which stays intact (and readable) until explicitly retired
    path2 = path + "_v2"
    compact_bucketed_ledger(
        spark, "t_seen_ledger", path, "t_seen_ledger_v2", path2,
        buckets=BUCKETS,
    )
    assert read_bucketed_ledger(spark, "t_seen_ledger").count() == 150_000
    lt = read_bucketed_ledger(spark, "t_seen_ledger_v2")
    assert len(glob.glob(os.path.join(path2, "*.parquet"))) == BUCKETS
    assert lt.count() == 150_000
    retire_ledger_version(spark, "t_seen_ledger", path)
    assert not os.path.exists(path)
    assert read_bucketed_ledger(spark, "t_seen_ledger_v2").count() == 150_000
    spark.sql("DROP TABLE IF EXISTS t_seen_ledger_v2")


def test_bloom_cutover_rides_the_bucketed_layout(spark, ledger, no_broadcast):
    """anti_join_via_bloom with broadcast_limit=0 takes the cutover
    (plain anti-join) path; a bucketed seen_keys table makes that path
    a one-sided shuffle with zero code changes in the operator."""
    lt, _ = ledger
    m_bits = plan_m_bits(200_000, 16)
    words = bloom_word_updates(lt, "url_key", m_bits).persist()
    batch = spark.range(50_000, 150_000).select(
        F.xxhash64("id").alias("url_key"),
        F.lit("h.example.com").alias("host"),
    )
    unseen, handle = anti_join_via_bloom(
        batch, lt, words, "url_key", m_bits=m_bits, broadcast_limit=0
    )
    plan = _formatted_plan(unseen)
    # ledger scans in place (bucketed), so the single Exchange is the
    # persisted batch re-partitioning into the bucket layout
    assert "Bucketed: true" in plan
    assert _node_names(plan).count("Exchange") == 1
    assert unseen.count() == 50_000
    handle.unpersist()
    words.unpersist()
