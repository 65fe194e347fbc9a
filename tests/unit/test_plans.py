"""Physical-plan shape regressions: the catalog queries must keep the
plans they were designed for — filters reaching the parquet scan,
columns pruned, small sides broadcast, top-k as TakeOrderedAndProject.
A correctness-passing query with a degraded plan fails here."""

import contextlib
import io

from web_crawler_search_engine_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark):
    p = _plan(catalog.q_pricing_summary(spark, SF))
    # shipdate predicate reaches the parquet scan
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters")[1].split("\n")[0]
    # column pruning: the 11-column table reads only the 7 needed
    read = p.split("ReadSchema")[1].split("\n")[0]
    assert "l_comment" not in read
    for c in ("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"):
        assert c in read
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_search_top5_is_take_ordered_with_broadcast(spark):
    p = _plan(catalog.q_search_top5(spark, SF))
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p


def test_semi_and_anti_joins_planned_as_joins(spark):
    p_semi = _plan(catalog.q_semi_join_parts(spark, SF))
    assert "LeftSemi" in p_semi
    p_anti = _plan(catalog.q_anti_join_seen(spark, SF))
    assert "LeftAnti" in p_anti


def test_url_canonicalize_single_stage_no_shuffle(spark):
    p = _plan(catalog.q_url_canonicalize(spark, SF))
    assert "Exchange" not in p  # pure per-row projection, no shuffle
    read = p.split("ReadSchema")[1].split("\n")[0]
    assert "props" not in read and "value" not in read


def test_top5_orders_broadcasts_dimensions(spark):
    p = _plan(catalog.q_top5_orders(spark, SF))
    assert p.count("BroadcastHashJoin") >= 2  # orders and customer sides


def test_lang_id_broadcasts_stopword_dim(spark):
    p = _plan(catalog.q_lang_id(spark, SF))
    assert "BroadcastHashJoin" in p
