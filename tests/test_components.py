"""Connected components (dataprep/components.py) vs a reference union-find."""

from __future__ import annotations

import random

import pytest

from raise_featurestore_spark.dataprep.components import (
    cluster_summary,
    connected_components,
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min of component
    return {n: find(n) for n in parent}


def _check(spark, edges: list[tuple[int, int]]) -> None:
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        (r.node, r.cluster) for r in connected_components(df).collect()
    }
    want = set(_union_find(edges).items())
    assert got == want


def test_chain(spark):
    # worst case for naive label propagation: a long path
    _check(spark, [(i, i + 1) for i in range(200)])


def test_cliques_and_isolated_pair(spark):
    edges = [(a, b) for a in range(10) for b in range(a + 1, 10)]
    edges += [(100, 101)]
    _check(spark, edges)


def test_duplicate_and_reversed_edges(spark):
    _check(spark, [(1, 2), (2, 1), (1, 2), (2, 3), (5, 4), (4, 5)])


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(400)]
    edges = [e for e in edges if e[0] != e[1]]
    _check(spark, edges)


def test_cluster_summary_counts(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    labels = connected_components(df)
    sizes = {r.cluster: r.n_docs for r in cluster_summary(labels).collect()}
    assert sizes == {1: 3, 10: 2}


def test_nonconvergence_guard(spark):
    # a path (not a star forest: node 2 is both leaf and center) needs at
    # least one contraction round, so max_iter=0 must trip the guard
    df = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError):
        connected_components(df, max_iter=0)


def test_star_forest_input_converges_in_zero_rounds(spark):
    # already a min-rooted star forest — the fixpoint test alone suffices
    df = spark.createDataFrame([(2, 1), (3, 1), (10, 9)], ["id_a", "id_b"])
    got = {
        (r.node, r.cluster) for r in connected_components(df, max_iter=0).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (9, 9), (10, 9)}
