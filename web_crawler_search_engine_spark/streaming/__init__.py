from .frontier_stream import (
    admit_stream,
    start_ledger_ingest,
    dedup_first_seen,
    frontier_ingest_stream,
    frontier_link_stream,
)
from .image_stream import image_delta_stream, start_image_ingest
from .rollup import hourly_rollup_stream, politeness_rate_limit_stream
from .text_stream import doc_bands, start_text_ingest, text_delta_stream

__all__ = [
    "doc_bands",
    "start_text_ingest",
    "text_delta_stream",
    "admit_stream",
    "start_ledger_ingest",
    "dedup_first_seen",
    "frontier_ingest_stream",
    "frontier_link_stream",
    "image_delta_stream",
    "start_image_ingest",
    "hourly_rollup_stream",
    "politeness_rate_limit_stream",
]
