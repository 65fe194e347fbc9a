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

from .checkpoints import KEY_BLOOM_OPTIONS


def _jpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _fs(spark: SparkSession, path: str):
    return _jpath(spark, path).getFileSystem(spark._jsc.hadoopConfiguration())


def ensure_ledger_table(
    spark: SparkSession,
    table: str,
    path: str,
    buckets: int,
    key_col: str = "url_key",
    schema: str = "url_key BIGINT, round INT",
) -> None:
    """(Re)register the external bucketed table over its files.

    The bucket layout lives in the session catalog, which does not
    survive a driver restart (sandbox in-memory catalog; on a cluster
    the metastore/Iceberg catalog carries it instead). Resume calls
    this to re-attach the catalog entry to the files already on disk:
    ``CREATE TABLE IF NOT EXISTS`` is a metadata-only operation — the
    data files (written by Spark's bucketed writer, bucket id encoded
    in each file name) are picked up as-is."""
    _fs(spark, path).mkdirs(_jpath(spark, path))
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({schema}) USING PARQUET "
        f"CLUSTERED BY ({key_col}) SORTED BY ({key_col}) "
        f"INTO {buckets} BUCKETS LOCATION '{path}'"
    )


def append_ledger_delta(
    delta: DataFrame,
    table: str,
    path: str,
    buckets: int,
    key_col: str = "url_key",
) -> None:
    """Append one round's keys: writes at most one file per bucket
    touched (the delta is repartitioned into the bucket layout), never
    rewrites standing buckets. Crash-atomicity belongs to the CALLER's
    round gate: rows carry the round they were appended for, readers
    filter ``round <= committed_round``, so a delta that lands without
    its manifest commit is invisible (and a re-run after such a crash
    only adds duplicate key rows — harmless for set-membership joins,
    folded out at the next compaction)."""
    writer = delta.repartition(buckets, key_col).write.format("parquet")
    for k, v in KEY_BLOOM_OPTIONS.items():
        writer = writer.option(k, v)
    (
        writer.bucketBy(buckets, key_col)
        .sortBy(key_col)
        .option("path", path)
        .mode("append")
        .saveAsTable(table)
    )


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
        # clear any stale files at the location (e.g. a compaction
        # that crashed after writing but before its manifest commit
        # published the new version) — Hadoop FS API, not a local
        # rm, so the same code runs against HDFS/S3 on a cluster
        _fs(spark, path).delete(_jpath(spark, path), True)
    # repartition on the bucket key with numPartitions == buckets:
    # Spark's bucket assignment is the same Murmur3 HashPartitioning,
    # so each write task holds exactly one bucket's rows and emits ONE
    # file per bucket — the state in which sort-merge reads the ledger
    # side sort-free (multi-file buckets still join exchange-free but
    # pay a per-read sort until compaction). Column Bloom + dictionary
    # stats on the key (KEY_BLOOM_OPTIONS) let the broadcast-backstop
    # semi scans skip row groups, same as the frontier log's writes.
    writer = keys.repartition(buckets, key_col).write.format("parquet")
    for k, v in KEY_BLOOM_OPTIONS.items():
        writer = writer.option(k, v)
    (
        writer.bucketBy(buckets, key_col)
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
    new_table: str,
    new_path: str,
    buckets: int = 64,
    key_col: str = "url_key",
) -> None:
    """Fold a multi-file-per-bucket ledger (after a window of appends)
    back to one sorted file per bucket — restores the sort-free merge
    join property. Same O(frontier)-once-per-window cost class as the
    frontier log compaction and the Bloom base fold.

    Writes the compacted copy as a NEW version at ``new_table`` /
    ``new_path`` and leaves the live ledger untouched: an in-place
    rewrite would have to destroy the only copy before its
    replacement finishes, so a crash mid-compaction would lose the
    entire seen set. The caller publishes the new version in its
    manifest/meta, then retires the old one with
    ``retire_ledger_version`` — a crash anywhere in between leaves
    the old version intact and the half-written new one unreferenced
    (its stale files are cleared by the next compaction's overwrite
    at that path). ``plans/crawl.py _compact`` is the same protocol
    with the round-gated key view.

    The rewrite source reads the PARQUET PATH, not the catalog table:
    the table's bucketing spec makes the planner elide the writer's
    ``repartition(buckets, key)`` as redundant, and the write then
    runs with file-split tasks holding mixed buckets — emitting
    several files per bucket, the exact state compaction exists to
    fold. The path read carries no layout metadata, so the shuffle
    into one-task-per-bucket stays in the plan."""
    write_bucketed_ledger(
        spark.read.parquet(path),
        new_table,
        new_path,
        buckets=buckets,
        key_col=key_col,
        mode="overwrite",
    )


def retire_ledger_version(
    spark: SparkSession, table: str, path: str
) -> None:
    """Drop a superseded ledger version (metadata drop + best-effort
    file cleanup) — only call after the replacement is published."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    _fs(spark, path).delete(_jpath(spark, path), True)
