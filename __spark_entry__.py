"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship search-pipeline query on sf0.001;
``queries``/``oracle_sql`` expose the full SURVEY.md §2 operator
catalog (web_crawler_search_engine_spark/plans/catalog.py) with
DuckDB oracle twins for the sf0.01 correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the end-to-end search
    pipeline (tokenize → tf-idf postings → score-sum → top-5 →
    metadata join), SURVEY.md §3.3."""
    from web_crawler_search_engine_spark.plans import catalog

    return catalog.q_search_top5(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from web_crawler_search_engine_spark.plans import catalog

    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    from web_crawler_search_engine_spark.plans import catalog

    return dict(catalog.ORACLE_SQL)
