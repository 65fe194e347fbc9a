"""Structured Streaming surface.

The reference pipeline is pure batch (SURVEY §2.9 — the crawl loop is
an iterative fixpoint, deliberately NOT expressed as a stream; see
SURVEY §7.5). These operators cover the streaming semantics a
continuously-fed deployment of the same engine needs:

  * ``hourly_rollup_stream`` — event-time tumbling-window aggregation
    with a watermark for late data: the streaming twin of
    ``catalog.q_hourly_events`` (same result on a closed input).
  * ``politeness_rate_limit_stream`` — per-key admission budgeting as
    a custom stateful operator (``applyInPandasWithState``): each key
    (host/user) admits at most ``budget`` rows per window, carrying
    the admitted-count state across micro-batches — the streaming
    form of the crawl scheduler's per-host politeness quota
    (reference web_crawler/crawler/frontier.py:116-135).

Both run under ``trigger(availableNow=True)`` for deterministic
batch-equivalent testing, and unchanged on a live source.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def hourly_rollup_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Windowed count/sum per event_type with late-data watermark.

    ``events`` must be a streaming DataFrame with columns
    (ts timestamp or timestamp_ntz, event_type string, value double).

    NTZ inputs are NOT naively cast to TIMESTAMP: watermarks are only
    defined on TIMESTAMP (Spark rejects NTZ event time), but the
    plain cast reinterprets wall-clock values through the session
    timezone — under any sub-hour-offset zone (e.g. +05:30) the
    epoch-aligned window boundaries land at :30/:45 of the wall
    clock and the 'HH:00' label names the wrong hour, diverging from
    the tz-free ``date_trunc`` of the batch twin
    ``catalog.q_hourly_events``. Instead the NTZ wall-clock is
    reinterpreted as a UTC instant (cast renders wall - offset;
    ``from_utc_timestamp`` adds the offset back), so window
    boundaries sit exactly on the wall-clock hours in EVERY session
    timezone, and the label applies the inverse shift before
    rendering. TIMESTAMP inputs keep plain session-zone semantics."""
    ntz = events.schema["ts"].dataType.typeName() == "timestamp_ntz"
    src = events
    start = F.col("win.start")
    if ntz:
        src = events.withColumn(
            "ts",
            F.from_utc_timestamp(
                F.col("ts").cast("timestamp"), F.current_timezone()
            ),
        )
        start = F.to_utc_timestamp(start, F.current_timezone())
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(start, "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_ADMIT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("event_id", LongType(), False),
        StructField("admitted_rank", IntegerType(), False),
    ]
)

_STATE_SCHEMA = StructType([StructField("admitted", IntegerType(), False)])


def _make_admitter(budget: int):
    def admit_fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        admitted = state.get[0] if state.exists else 0
        # a key's micro-batch rows can span several Arrow chunks:
        # concatenate BEFORE sorting so admission follows the global
        # (ts, event_id) order within the batch, not chunk arrival
        # order (chunk-local sort was nondeterministic at scale)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"])
            room = max(budget - admitted, 0)
            take = pdf.head(room)
            if len(take):
                ranks = range(admitted + 1, admitted + len(take) + 1)
                yield pd.DataFrame(
                    {
                        "key": key[0],
                        "event_id": take["event_id"].to_numpy(),
                        "admitted_rank": list(ranks),
                    }
                )
                admitted += len(take)
        state.update((admitted,))

    return admit_fn


def politeness_rate_limit_stream(
    events: DataFrame, key_col: str = "user_id", budget: int = 3
) -> DataFrame:
    """Admit at most ``budget`` rows per key across the whole stream,
    in (ts, event_id) order within each micro-batch; admitted counts
    persist in GroupState across batches. Streaming analog of
    ``operators.scheduler.admit`` (P7)."""
    keyed = events.select(
        F.col(key_col).cast("string").alias("key"), "event_id", "ts"
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _make_admitter(budget),
        outputStructType=_ADMIT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
