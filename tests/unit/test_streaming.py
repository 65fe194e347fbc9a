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


def test_frontier_ingest_stream_equals_batch_dedup_admit(spark):
    """frontier_ingest_stream (streaming X1 dedup + P7 stateful
    admission) over a closed two-flush drop directory equals the batch
    twin: first-seen dedup, then per-host top-budget by discovery_seq."""
    import tempfile

    from web_crawler_search_engine_spark.streaming import (
        frontier_ingest_stream,
    )

    rows = []
    seq = 0
    for h in ("a", "b", "c"):
        for i in range(10):
            url = f"https://{h}.example.com/p/{i}"
            rows.append((hash(url), url, f"{h}.example.com", 1, seq))
            seq += 1
    # exact duplicate keys (same payload) — dedup must keep one copy
    dupes = [rows[0], rows[11], rows[22]]
    cols = "url_key long, url string, host string, depth int, discovery_seq long"
    d = tempfile.mkdtemp(prefix="frontier_stream_")
    spark.createDataFrame(rows[:20] + dupes, cols).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame(rows[20:] + dupes, cols).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    budget = 4
    got = _run_available_now(
        frontier_ingest_stream(spark, d, budget), spark, "frontier_t"
    )
    batch = spark.read.parquet(d)
    from pyspark.sql import Window

    w1 = Window.partitionBy("url_key").orderBy("discovery_seq")
    w2 = Window.partitionBy("host").orderBy("discovery_seq", "url_key")
    want = (
        batch.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .withColumn("admitted_rank", F.row_number().over(w2))
        .filter(F.col("admitted_rank") <= budget)
        .select("host", "url_key", "url", "discovery_seq", "admitted_rank")
        .collect()
    )
    key = lambda r: (r["host"], r["admitted_rank"])  # noqa: E731
    assert sorted(
        [(r["host"], r["admitted_rank"], r["url_key"]) for r in got]
    ) == sorted([(r["host"], r["admitted_rank"], r["url_key"]) for r in want])
    shutil.rmtree(d, ignore_errors=True)


def test_ledger_ingest_foreachbatch_composition(spark, tmp_path_factory):
    """start_ledger_ingest: each micro-batch anti-joins the batch
    engine's committed URL ledger AND the stream's own seen log, admits
    per-host budget, and commits atomically keyed by batch_id. URLs
    already in the crawl ledger are never admitted; a key arriving in
    two flushes is admitted once."""
    from web_crawler_search_engine_spark.sources.checkpoints import (
        SnapshotStore,
    )
    from web_crawler_search_engine_spark.streaming import start_ledger_ingest

    cols = "url_key long, url string, host string, depth int, discovery_seq long"

    def row(h, i, seq):
        url = f"https://{h}.example.com/p/{i}"
        return (hash(url), url, f"{h}.example.com", 1, seq)

    # crawl ledger already contains hosts a/b page 0
    ledger_store = SnapshotStore(spark, str(tmp_path_factory.mktemp("ledger")))
    ledger_store.commit(
        0,
        log_appends={
            "frontier_log": spark.createDataFrame(
                [row("a", 0, 100), row("b", 0, 101)], cols
            ).select("url_key")
        },
    )

    drop = str(tmp_path_factory.mktemp("drop"))
    flush1 = [row("a", i, i) for i in range(5)] + [row("b", 0, 90)]
    flush2 = [row("a", i, 50 + i) for i in range(3, 8)] + [row("b", 1, 99)]
    spark.createDataFrame(flush1, cols).coalesce(1).write.mode("append").parquet(drop)

    out_store = SnapshotStore(spark, str(tmp_path_factory.mktemp("out")))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = start_ledger_ingest(
        spark, drop, out_store, ckpt, budget=3, ledger_store=ledger_store
    )
    q.awaitTermination(120)
    # second flush arrives; a new availableNow pass drains it
    spark.createDataFrame(flush2, cols).coalesce(1).write.mode("append").parquet(drop)
    q2 = start_ledger_ingest(
        spark, drop, out_store, ckpt, budget=3, ledger_store=ledger_store
    )
    q2.awaitTermination(120)

    got = {
        (r["host"], r["url_key"])
        for r in out_store.load_log("stream_admitted").collect()
    }
    urls_a = {r[0] for r in flush1 + flush2 if r[2].startswith("a")}
    # host a: ledger blocks p/0; flush1 admits seqs 1,2,3 (budget 3);
    # flush2's fresh keys are p/5,6,7 (p/3,4 seen in flush1) -> 3 more
    a_admitted = {k for h, k in got if h == "a.example.com"}
    assert len(a_admitted) == 6 and a_admitted <= urls_a
    assert (("b.example.com", hash("https://b.example.com/p/0"))) not in got
    assert (("b.example.com", hash("https://b.example.com/p/1"))) in got


def test_ledger_ingest_is_lossless(spark, tmp_path_factory):
    """Over-budget keys are shed to stream_pending, not lost:
    admitted ∪ pending = all fresh keys of the batch."""
    from web_crawler_search_engine_spark.sources.checkpoints import (
        SnapshotStore,
    )
    from web_crawler_search_engine_spark.streaming import start_ledger_ingest

    cols = "url_key long, url string, host string, depth int, discovery_seq long"
    rows = [
        (i, f"https://a.example.com/p/{i}", "a.example.com", 1, i)
        for i in range(10)
    ]
    drop = str(tmp_path_factory.mktemp("drop2"))
    spark.createDataFrame(rows, cols).coalesce(1).write.mode("append").parquet(drop)
    out_store = SnapshotStore(spark, str(tmp_path_factory.mktemp("out2")))
    q = start_ledger_ingest(
        spark, drop, out_store, str(tmp_path_factory.mktemp("ck2")), budget=4
    )
    q.awaitTermination(120)
    admitted = {r["url_key"] for r in out_store.load_log("stream_admitted").collect()}
    pending = {r["url_key"] for r in out_store.load_log("stream_pending").collect()}
    assert admitted == {0, 1, 2, 3}  # budget 4, discovery_seq order
    assert admitted | pending == set(range(10)) and not (admitted & pending)


def test_hourly_rollup_stream_tz_free_under_sub_hour_offset(spark, stream_src):
    """NTZ wall-clock bucketing must not shift with the session zone:
    under +05:30 a naive NTZ->TIMESTAMP cast puts epoch-aligned window
    boundaries at :30 of the wall clock and mislabels every bucket."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        batch = spark.read.parquet(stream_src)
        src = spark.readStream.schema(batch.schema).parquet(stream_src)
        got = _run_available_now(
            hourly_rollup_stream(src, watermark="0 seconds"), spark, "rollup_tz"
        )
        # ground truth: tz-free truncation of the NTZ wall-clock
        want = (
            batch.groupBy(
                F.date_format(
                    F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00"
                ).alias("hour"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
            .collect()
        )
        key = lambda r: (r["hour"], r["event_type"])  # noqa: E731
        got_m = {key(r): (r["n"], r["sum_value"]) for r in got}
        want_m = {key(r): (r["n"], r["sum_value"]) for r in want}
        last_hour = max(h for h, _ in want_m)
        assert {k: v for k, v in got_m.items() if k[0] < last_hour} == {
            k: v for k, v in want_m.items() if k[0] < last_hour
        }
        assert set(got_m) <= set(want_m)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
