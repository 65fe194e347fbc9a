"""SparkSession factory with scale-oriented defaults.

Single place where engine-wide Spark configuration lives so tests,
bench, and the driver contract all run the same physical profile.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "web-crawler-search-engine-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    Defaults chosen for the 100 TB design point, scaled to local mode:
      * AQE on (runtime coalescing + skew-join splitting — complements
        the explicit hot-host salting in plans/crawl.py).
      * Arrow execution for all pandas UDF exchange.
      * shuffle partitions sized to cores in local mode (on a real
        cluster this would be ~2-3x total executor cores; AQE coalesces
        down after the fact).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("", "*") else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # bucketed-sorted scans (sources/ledger.py) report their sort
        # order when each bucket holds one file — post-compaction the
        # exact-backstop cutover then sort-merges the ledger with no
        # Exchange AND no Sort on the ledger side. Inert for every
        # non-bucketed read (it only adds a files-per-bucket check on
        # bucketed scans).
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
