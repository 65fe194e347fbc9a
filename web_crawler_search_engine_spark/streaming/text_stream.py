"""Streaming text near-dup ingestion: MinHash-LSH dedup as a
continuous pipeline — the streaming twin of the batch
``q_dedup_minhash_lsh`` candidates (plans/catalog.py), with the LSH
state as a persistent BAND ledger instead of stream state.

A fetch pipeline that publishes parsed documents continuously needs
the near-dup decision per micro-batch against everything already
ingested. The relational form:

  1. per doc: distinct word 3-shingles → 8 seeded min-hashes → 4
     bands of 2 (identical scheme and portable md5 hashing to the
     batch query, so batch and stream agree on what "near-dup" is),
  2. DECISION — a doc is dropped iff ANY of its bands was emitted by
     an earlier arrival (same batch) or by a committed batch. "Earlier
     arrival" counts kept AND dropped docs: every batch commits ALL
     its docs' bands, which makes the rule identical whether the
     corpus arrives as one batch or many (availableNow == batch,
     tested) and needs only one min(arrival)-per-band aggregate — no
     sequential greedy pass. It over-drops transitive chains
     (A≈B≈C ⇒ C dropped even though C≉A) — exactly the conservative
     behavior corpus dedup wants (Lee et al. 2022 dedup both sides).
  3. kept rows append to ``stream_docs``; all bands append to
     ``band_seen``; one atomic manifest commit per batch_id —
     at-least-once foreachBatch replays of a committed batch are
     skipped (exactly-once log, same argument as frontier_stream).

Docs with < 3 tokens have no shingles, hence no bands: never dropped,
never block anything (matches the batch query's shingle guard).

Scale shape: the only joins are band-keyed — the ledger anti-join is
an equi-join on band (at 10^10 the Bloom layer of operators/seen.py
slots in on xxhash64(band) exactly like url_key), and the in-batch
decision is one groupBy(band) + one groupBy(doc). No all-pairs stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

TEXT_DELTA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
        StructField("arrival_seq", LongType(), False),
    ]
)

_N_HASHES = 8
_N_BANDS = 4


def doc_bands(df: DataFrame) -> DataFrame:
    """(doc_id, arrival_seq, band) — one row per LSH band per doc,
    the q_dedup_minhash_lsh scheme verbatim: distinct 3-shingles,
    8 seeded portable min-hashes, 4 bands of 2 hashes."""
    tri = F.expr(
        "case when size(split(text,' ')) >= 3 then"
        " transform(sequence(1, size(split(text,' ')) - 2),"
        " i -> concat_ws(' ', element_at(split(text,' '), i),"
        " element_at(split(text,' '), i + 1),"
        " element_at(split(text,' '), i + 2)))"
        " else cast(array() as array<string>) end"
    )
    sh = df.select(
        "doc_id", "arrival_seq", F.explode(tri).alias("sh")
    ).distinct()
    mh = sh.groupBy("doc_id", "arrival_seq").agg(
        *[
            F.min(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh"))), 1, 15),
                    16,
                    10,
                ).cast("long")
            ).alias(f"mh{i}")
            for i in range(_N_HASHES)
        ]
    )
    bands = [
        F.concat_ws(
            ",",
            F.lit(str(b)),
            F.col(f"mh{2 * b}").cast("string"),
            F.col(f"mh{2 * b + 1}").cast("string"),
        ).alias("band")
        for b in range(_N_BANDS)
    ]
    return mh.select(
        "doc_id", "arrival_seq", F.explode(F.array(*bands)).alias("band")
    )


def text_delta_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    return spark.readStream.schema(TEXT_DELTA_SCHEMA).parquet(docs_dir)


def start_text_ingest(
    spark: SparkSession,
    docs_dir: str,
    store,
    ckpt_dir: str,
    band_log: str = "band_seen",
    out_log: str = "stream_docs",
    available_now: bool = True,
):
    """Returns the StreamingQuery; availableNow=True drains a closed
    directory and stops (the tested mode)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        bid = int(batch_id)
        committed = (store.manifest() or {}).get("logs", {})
        if any(
            p.endswith(f"{_os.sep}d{bid}")
            for p in committed.get(out_log, {}).get("deltas", [])
        ):
            return  # at-least-once replay of an already-committed batch
        batch = batch_df.persist()
        bands = doc_bands(batch).persist()
        try:
            seen = store.load_log(band_log).select("band")
        except FileNotFoundError:
            seen = None
        # in-batch: a band blocks every arrival after its first
        # ((arrival_seq, doc_id) struct order — deterministic ties)
        first = bands.groupBy("band").agg(
            F.min(F.struct("arrival_seq", "doc_id")).alias("_first")
        )
        blocked = bands.join(first, "band").filter(
            F.struct("arrival_seq", "doc_id") > F.col("_first")
        )
        if seen is not None:
            blocked = blocked.unionByName(
                bands.join(seen, "band", "left_semi"), allowMissingColumns=True
            )
        drop_ids = blocked.select("doc_id").distinct()
        kept = batch.join(drop_ids, "doc_id", "left_anti")
        store.commit(
            bid,
            log_appends={
                out_log: kept,
                band_log: bands.select("band").distinct(),
            },
            carry_tables=True,
        )
        bands.unpersist()
        batch.unpersist()

    q = (
        text_delta_stream(spark, docs_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt_dir)
    )
    if available_now:
        q = q.trigger(availableNow=True)
    return q.start()
