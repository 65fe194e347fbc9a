"""Repo-wide plan lock for the input_hint's 'no per-row Python'
invariant (BASELINE.json): NO catalog query may plan a row-at-a-time
Python stage (`BatchEvalPython`). Vectorized Arrow stages
(`ArrowEvalPython`, `MapInPandas`, `FlatMapGroupsInPandas`) are the
sanctioned Python escape hatch and are allowed ONLY for the queries
documented to use a pandas UDF — anything new that sneaks Python into
a plan must either be JVM Column expressions or join this explicit
allowlist with a reason."""

from __future__ import annotations

import re

import pytest

from web_crawler_search_engine_spark.plans.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# queries whose documented semantics run a vectorized pandas UDF
# (stdlib-parity robots evaluation, image/audio/video codecs)
ARROW_ALLOWED = {
    "q_robots_gate",  # U4 robots can_fetch pandas UDF
    "q_image_phash_dedup",
    "q_image_dedup_decision",
    "q_image_hamming_pairs",
    "q_image_neardup_clusters",
    "q_image_curate",
    "q_image_quality",
    "q_caption_carry",
    "q_audio_features",
    "q_video_frame_sample",
}

_ARROW_NODES = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def _plan(spark, df) -> str:
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_row_at_a_time_python(spark, name):
    plan = _plan(spark, QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, (
        f"{name} plans a row-at-a-time Python stage"
    )
    arrow_nodes = [n for n in _ARROW_NODES if re.search(n, plan)]
    if name not in ARROW_ALLOWED:
        assert not arrow_nodes, (
            f"{name} plans a Python stage {arrow_nodes} but is not on "
            "the documented pandas-UDF allowlist"
        )
