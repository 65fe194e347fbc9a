from .frontier_stream import (
    admit_stream,
    start_ledger_ingest,
    dedup_first_seen,
    frontier_ingest_stream,
    frontier_link_stream,
)
from .rollup import hourly_rollup_stream, politeness_rate_limit_stream

__all__ = [
    "admit_stream",
    "start_ledger_ingest",
    "dedup_first_seen",
    "frontier_ingest_stream",
    "frontier_link_stream",
    "hourly_rollup_stream",
    "politeness_rate_limit_stream",
]
