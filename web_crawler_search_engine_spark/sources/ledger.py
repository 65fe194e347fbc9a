"""Bucketed on-disk URL-seen ledger: co-located exact anti-joins.

north_rule P8 at 10^10 URLs: the exact-backstop's *broadcast* path
(`operators/seen.py anti_join_via_bloom`) covers the steady state —
the maybe-set is batch-sized, so it broadcasts into a column-pruned
map-side semi scan and the ledger is never shuffled. The CUTOVER path
(a pathological maybe-set beyond the broadcast budget) previously fell
back to a plain shuffle anti-join, which re-shuffles the WHOLE ledger
— O(frontier) movement for one bad round, exactly the class of cost
this engine exists to avoid.

This module stores the ledger as a Spark BUCKETED TABLE
(``bucketBy(N, url_key)`` + ``sortBy``): the ledger's parquet files
are hash-clustered by key at WRITE time, so any equi-join on
``url_key`` plans with NO Exchange on the ledger side — Catalyst
shuffles only the probe/batch side into the ledger's bucket layout
(one-sided shuffle, O(batch) rows moved at any ledger size). The
plan shape is locked by tests/unit/test_bucketed_ledger.py.

Scale notes:
  * Bucket count is a write-time layout decision, like the index's
    token_bucket directory fan-out (plans/indexer.py): pick ~2-4x the
    target executor count so every core owns a few buckets. Appends
    (``mode="append"``) add one file per bucket per round; the same
    periodic compaction contract the frontier log uses
    (sources/checkpoints.py) bounds file counts.
  * ``sortBy(url_key)`` keeps each bucket file key-sorted, so a
    sort-merge join reads the ledger side sort-FREE when each bucket
    holds one file (post-compaction state) — the cutover anti-join
    then streams the ledger without shuffling OR sorting it.
  * The bucket metadata lives in the session catalog. On a real
    cluster this is the shared metastore — or, equivalently, an
    Iceberg table with a ``bucket(N, url_key)`` partition transform
    (the same manifest-analog swap documented in
    sources/checkpoints.py). The join-locality contract is identical;
    only the catalog carrying the layout differs.

Reference analog: the in-process ``seen`` set persisted by
web_crawler/crawler/frontier.py:137-146 — here it is a distributed
table whose physical layout makes membership joins local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_ledger(
    keys: DataFrame,
    table: str,
    path: str,
    buckets: int = 64,
    key_col: str = "url_key",
    mode: str = "overwrite",
) -> None:
    """Persist ``keys`` as a bucketed+sorted external table at ``path``.

    ``mode="append"`` adds a round's delta without rewriting standing
    buckets (each append writes one file per bucket it touches);
    ``compact_bucketed_ledger`` folds the accumulated files back to
    one file per bucket.
    """
    spark = keys.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    # repartition on the bucket key with numPartitions == buckets:
    # Spark's bucket assignment is the same Murmur3 HashPartitioning,
    # so each write task holds exactly one bucket's rows and emits ONE
    # file per bucket — the state in which sort-merge reads the ledger
    # side sort-free (multi-file buckets still join exchange-free but
    # pay a per-read sort until compaction)
    (
        keys.repartition(buckets, key_col)
        .write.format("parquet")
        .bucketBy(buckets, key_col)
        .sortBy(key_col)
        .option("path", path)
        .mode(mode)
        .saveAsTable(table)
    )


def read_bucketed_ledger(spark: SparkSession, table: str) -> DataFrame:
    """The ledger as a DataFrame that CARRIES its bucketing: equi-joins
    on the bucket key plan without an Exchange on this side. (Reading
    the parquet path directly would return the same rows but lose the
    layout metadata — always read through the catalog.)"""
    return spark.table(table)


def compact_bucketed_ledger(
    spark: SparkSession,
    table: str,
    path: str,
    buckets: int = 64,
    key_col: str = "url_key",
) -> None:
    """Fold a multi-file-per-bucket ledger (after a window of appends)
    back to one sorted file per bucket — restores the sort-free merge
    join property. Same O(frontier)-once-per-window cost class as the
    frontier log compaction and the Bloom base fold."""
    staged = spark.table(table).localCheckpoint(eager=True)
    write_bucketed_ledger(
        staged, table, path, buckets=buckets, key_col=key_col, mode="overwrite"
    )
