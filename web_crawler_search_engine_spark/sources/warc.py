"""WARC source/sink: the standard web-archive container for crawl
payloads (ISO 28500 / WARC 1.0, implemented from the public spec —
no warcio in this container).

The reference persists fetched pages as per-URL files under pages/
(crawler/worker.py:118-121); production crawls persist them as WARC
segments. This module gives the engine that ingestion path:

  * ``encode_warc(records)`` — bytes of one WARC file: a ``warcinfo``
    record followed by one ``response`` record per page, each with
    the mandatory WARC-Type / WARC-Record-ID / WARC-Date /
    WARC-Target-URI / Content-Type / Content-Length headers and
    CRLF CRLF framing + trailing CRLF CRLF (spec §4).
  * ``read_warc(spark, path)`` — DataFrame (segment, url, warc_date,
    content_type, payload) over a directory of ``*.warc`` segments.

Scale shape: segments load through Spark's ``binaryFile`` source —
one task per segment, so parallelism = segment count (production
segments are ~1 GB by convention; a directory of them fans out
across the cluster with no shuffle at all). Parsing is a
``mapInPandas`` over the segment bytes — Arrow-batched, pure byte
scanning, one pass per segment, no per-row Python round trips. The
parser SKIPS records it cannot frame (truncated tail, non-response
types) instead of failing the task: a crawl archive at 10^10 pages
always carries some damage, and one bad record must not poison a
1 GB segment.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"

WARC_SCHEMA = StructType(
    [
        StructField("segment", StringType(), False),
        StructField("url", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def _record(headers: list[tuple[str, str]], body: bytes) -> bytes:
    head = b"WARC/1.0" + _CRLF
    head += b"".join(
        f"{k}: {v}".encode() + _CRLF for k, v in headers
    )
    head += f"Content-Length: {len(body)}".encode() + _CRLF
    return head + _CRLF + body + _CRLF + _CRLF


def _record_id(seed: str) -> str:
    # deterministic urn:uuid from the seed — reproducible segments
    h = hashlib.md5(seed.encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def encode_warc(
    records: Iterable[tuple[str, str, str, bytes]],
    segment_name: str = "segment",
) -> bytes:
    """One WARC file: warcinfo + a response record per
    (url, iso_date, content_type, payload)."""
    info_body = b"software: web_crawler_search_engine_spark" + _CRLF
    out = [
        _record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Record-ID", _record_id(segment_name)),
                ("WARC-Date", "2024-01-01T00:00:00Z"),
                ("WARC-Filename", f"{segment_name}.warc"),
                ("Content-Type", "application/warc-fields"),
            ],
            info_body,
        )
    ]
    for url, date, ctype, payload in records:
        out.append(
            _record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Record-ID", _record_id(url)),
                    ("WARC-Date", date),
                    ("WARC-Target-URI", url),
                    ("Content-Type", ctype),
                ],
                bytes(payload),
            )
        )
    return b"".join(out)


def parse_warc_bytes(
    blob: bytes,
) -> Iterator[tuple[str, str, str, bytes]]:
    """Yield (url, date, content_type, payload) for every well-formed
    ``response`` record; skip everything else (spec-tolerant)."""
    i, n = 0, len(blob)
    while i < n:
        start = blob.find(b"WARC/1.0", i)
        if start < 0:
            return
        head_end = blob.find(_CRLF + _CRLF, start)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in blob[start:head_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            i = head_end + 4
            continue
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            return  # truncated tail
        if headers.get("warc-type") == "response" and "warc-target-uri" in headers:
            yield (
                headers["warc-target-uri"],
                headers.get("warc-date", ""),
                headers.get("content-type", ""),
                blob[body_start:body_end],
            )
        i = body_end + 4  # past the record's trailing CRLF CRLF


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """All response records of every ``*.warc`` segment under
    ``path``. One binaryFile task per segment; Arrow-batched parse."""
    import pandas as pd  # noqa: PLC0415 — executor-side import

    segments = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc")
        .load(path)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seg_path, blob in zip(pdf["path"], pdf["content"]):
                for url, date, ctype, payload in parse_warc_bytes(bytes(blob)):
                    rows.append((seg_path, url, date, ctype, payload))
            yield pd.DataFrame(
                rows, columns=["segment", "url", "warc_date", "content_type", "payload"]
            )

    return segments.mapInPandas(_parse, WARC_SCHEMA)


def write_warc_segments(
    rows: list[tuple[str, str, str, bytes]],
    out_dir: str,
    n_segments: int = 4,
) -> list[str]:
    """Test/driver helper: split rows round-robin into ``n_segments``
    local ``*.warc`` files (the real sink on a cluster is a
    foreachPartition writing one segment per partition to object
    storage — same encode_warc bytes)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for s in range(n_segments):
        part = rows[s::n_segments]
        p = os.path.join(out_dir, f"seg{s:04d}.warc")
        with open(p, "wb") as f:
            f.write(encode_warc(part, segment_name=f"seg{s:04d}"))
        paths.append(p)
    return paths


def pages_from_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC records shaped like the engine's pages table input
    (url, content string, fetched length) — the adapter the indexer's
    S8/S9 scan consumes, HTML gate and 10 MB size gate downstream
    unchanged."""
    recs = read_warc(spark, path)
    return recs.select(
        "url",
        F.col("payload").cast("string").alias("content"),
        F.length("payload").cast("long").alias("length"),
        "content_type",
    )
