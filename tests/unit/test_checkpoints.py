"""SnapshotStore contract tests (sources/checkpoints.py).

The crash/atomicity story is exercised end-to-end by the parity
crash-window tests; this file locks the smaller manifest-assembly
contracts a caller could silently violate.
"""

import pytest

from web_crawler_search_engine_spark.sources.checkpoints import SnapshotStore


def test_double_append_same_round_is_loud(spark, tmp_path):
    """A second log append to the same log under one round id would
    overwrite the first delta's parquet while double-listing the path
    in the manifest (rows double-counted over lost data). The store
    must refuse it instead of corrupting the log."""
    store = SnapshotStore(spark, str(tmp_path / "store"))
    df = spark.range(5).withColumnRenamed("id", "url_key")
    store.commit(1, log_appends={"lg": df})
    with pytest.raises(ValueError, match="already has a delta"):
        store.commit(1, log_appends={"lg": df})
    # the log is intact: exactly the first append's rows, listed once
    assert store.load_log("lg").count() == 5
    assert store.log_delta_count("lg") == 1
    # a fresh round appends normally
    store.commit(2, log_appends={"lg": df})
    assert store.load_log("lg").count() == 10


def test_compact_then_append_same_round_allowed(spark, tmp_path):
    """The crawl's real two-commit shape — round commit appends d<r>,
    the SAME round's compaction commit replaces the base and clears
    deltas (log_compact c<r>) — must stay legal."""
    store = SnapshotStore(spark, str(tmp_path / "store"))
    df = spark.range(3).withColumnRenamed("id", "url_key")
    store.commit(1, log_appends={"lg": df})
    store.commit(1, log_compact={"lg": store.load_log("lg")}, carry_tables=True)
    assert store.log_delta_count("lg") == 0
    assert store.load_log("lg").count() == 3
    # and appending under round 1 again after compaction is fine —
    # the delta list no longer carries d1
    store.commit(1, log_appends={"lg": df})
    assert store.load_log("lg").count() == 6
