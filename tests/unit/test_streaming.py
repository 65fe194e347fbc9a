"""Streaming operators: availableNow runs must equal the batch twins."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from web_crawler_search_engine_spark.streaming import (
    hourly_rollup_stream,
    politeness_rate_limit_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_src(spark):
    """events parquet re-staged so readStream sees a closed directory."""
    d = tempfile.mkdtemp(prefix="stream_src_")
    spark.read.parquet(f"{SF}/events.parquet").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_available_now(stream_df, spark, name):
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    shutil.rmtree(ckpt, ignore_errors=True)
    return rows


def test_hourly_rollup_stream_equals_batch(spark, stream_src):
    batch = spark.read.parquet(stream_src)
    schema = batch.schema
    src = spark.readStream.schema(schema).parquet(stream_src)
    got = _run_available_now(
        hourly_rollup_stream(src, watermark="0 seconds"), spark, "rollup_t"
    )
    want = (
        batch.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
        )
        .collect()
    )
    key = lambda r: (r["hour"], r["event_type"])  # noqa: E731
    got_m = {key(r): (r["n"], r["sum_value"]) for r in got}
    want_m = {key(r): (r["n"], r["sum_value"]) for r in want}
    # append mode never closes the window holding max event time (the
    # watermark cannot pass it) — every other window must match exactly
    last_hour = max(h for h, _ in want_m)
    want_closed = {k: v for k, v in want_m.items() if k[0] < last_hour}
    got_closed = {k: v for k, v in got_m.items() if k[0] < last_hour}
    assert got_closed == want_closed
    assert set(got_m) <= set(want_m)


def test_politeness_rate_limit_stream(spark, stream_src):
    batch = spark.read.parquet(stream_src)
    schema = batch.schema
    src = spark.readStream.schema(schema).parquet(stream_src)
    got = _run_available_now(
        politeness_rate_limit_stream(src, "user_id", budget=3), spark, "admit_t"
    )
    # per key: at most 3 admitted, ranks 1..k
    from collections import defaultdict

    per_key = defaultdict(list)
    for r in got:
        per_key[r["key"]].append(r["admitted_rank"])
    assert per_key, "stream admitted nothing"
    for k, ranks in per_key.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    # every user with >=1 event appears
    n_users = batch.select("user_id").distinct().count()
    assert len(per_key) == n_users
