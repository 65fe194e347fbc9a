"""Connected-components cross-check: star contraction vs min-label
propagation must agree label-for-label on every graph shape —
including the long-chain case star contraction exists for (diameter-
many rounds for propagation, O(log n) for contraction)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from web_crawler_search_engine_spark.plans.catalog import (
    _min_label_components,
    _star_components,
)


def _run_both(spark, n_verts: int, edge_list: list[tuple[int, int]]):
    verts = spark.createDataFrame(
        [(i,) for i in range(n_verts)], "vec_id long"
    )
    pairs = (
        spark.createDataFrame(edge_list, "vec_a long, vec_b long")
        if edge_list
        else spark.createDataFrame([], "vec_a long, vec_b long")
    )
    star = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in _star_components(
            verts, pairs, "vec_id", "vec_a", "vec_b"
        ).collect()
    }
    prop = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in _min_label_components(
            verts, pairs, "vec_id", "vec_a", "vec_b"
        ).collect()
    }
    return star, prop


def _oracle(n_verts: int, edge_list: list[tuple[int, int]]):
    """Union-find ground truth."""
    parent = list(range(n_verts))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, int] = {}
    for v in range(n_verts):
        r = find(v)
        comp[v] = min(comp.get(r, v), v) if r in comp else v
    # second pass: label = min of component
    mins: dict[int, int] = {}
    for v in range(n_verts):
        r = find(v)
        mins[r] = min(mins.get(r, v), v)
    return {v: (mins[find(v)], v == mins[find(v)]) for v in range(n_verts)}


def test_long_chain(spark):
    """A 60-node path: the shape where propagation needs 60 rounds
    and star contraction needs ~6."""
    edges = [(i, i + 1) for i in range(59)]
    star, prop = _run_both(spark, 60, edges)
    want = _oracle(60, edges)
    assert star == want
    assert prop == want


@pytest.mark.parametrize("seed", [7, 21])
def test_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 80
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(70)
    ]
    star, prop = _run_both(spark, n, edges)
    want = _oracle(n, edges)
    assert star == want
    assert prop == want


def test_no_edges_all_singletons(spark):
    star, prop = _run_both(spark, 10, [])
    want = {v: (v, True) for v in range(10)}
    assert star == want
    assert prop == want
