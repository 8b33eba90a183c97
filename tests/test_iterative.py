"""Iterative-algorithm invariants (operators/iterative.py): Lloyd's
k-means cost monotonicity + deterministic assignment, and connected
components against a NumPy/union-find oracle (the reference repo class's
"serial baseline" pattern, SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from knn_with_mapreduce_cuda_spark import tables
from knn_with_mapreduce_cuda_spark.operators.iterative import (
    _seed_centroids,
    connected_components,
    kmeans_assign,
    kmeans_lloyd,
)
from tests.conftest import SF_SMOKE


def test_kmeans_assigns_every_vector_once(spark):
    e = tables.embeddings(spark, SF_SMOKE)
    assign = kmeans_lloyd(e).collect()
    n = e.count()
    assert len(assign) == n
    assert len({r.vec_id for r in assign}) == n
    clusters = {r.c for r in assign}
    assert clusters <= set(range(5)) and len(clusters) > 1


def test_kmeans_iteration_does_not_increase_cost(spark):
    e = tables.embeddings(spark, SF_SMOKE)
    emb = {r.vec_id: np.array(r.emb) for r in e.collect()}

    def cost(assign_df, cents_by_c):
        return sum(
            float(np.sum((emb[r.vec_id] - cents_by_c[r.c]) ** 2))
            for r in assign_df.collect()
        )

    seeds = _seed_centroids(e)
    seed_cents = {r.c: np.array(r.cent) for r in seeds.collect()}
    a1 = kmeans_assign(e, seeds)
    # recomputed means minimize within-cluster SSE for the same assignment,
    # and reassignment can only lower it further (Lloyd monotonicity)
    members: dict[int, list] = {}
    for r in a1.collect():
        members.setdefault(r.c, []).append(emb[r.vec_id])
    new_cents = {c: np.mean(v, axis=0) for c, v in members.items()}
    a2 = kmeans_lloyd(e, iters=2)
    assert cost(a2, new_cents) <= cost(a1, seed_cents) + 1e-6


def test_connected_components_matches_union_find(spark):
    nodes = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (8, 9), (2, 3)], ["a", "b"]
    )
    got = {r.id: r.cluster for r in connected_components(nodes, edges).collect()}
    # union-find oracle
    parent = list(range(10))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in [(0, 1), (1, 2), (5, 6), (8, 9), (2, 3)]:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(10)}
    assert got == want


def test_connected_components_chain_diameter(spark):
    # a path graph exercises multi-round propagation (diameter > 1)
    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["a", "b"])
    got = {r.id: r.cluster for r in connected_components(nodes, edges).collect()}
    assert got == {i: 0 for i in range(n)}


def test_connected_components_contraction_branches(spark):
    """r12 star contraction: (a) a clique's quotient is EMPTY after the
    l0 pass (the loop-skip branch — every node's min neighbor is the
    component min), (b) interleaved chains leave a NON-empty quotient
    that the propagation loop must still converge, (c) isolated nodes
    ride the anti-join append. Oracle = min reachable id by hand."""
    nodes = spark.createDataFrame([(i,) for i in range(20)], ["id"])
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]  # 0-4
    # 5-9 chained through high-low alternation so l0 contracts only
    # partially: 9-6, 6-8, 8-5, 5-7  => component min 5, diameter 4
    chain = [(9, 6), (6, 8), (8, 5), (5, 7)]
    # 10-12 a triangle reached through a bridge from 13
    tri = [(10, 11), (11, 12), (10, 12), (12, 13)]
    edges = spark.createDataFrame(clique + chain + tri, ["a", "b"])
    got = {r.id: r.cluster for r in connected_components(nodes, edges).collect()}
    want = {i: 0 for i in range(5)}
    want.update({i: 5 for i in range(5, 10)})
    want.update({i: 10 for i in range(10, 14)})
    want.update({i: i for i in range(14, 20)})  # isolated fixpoints
    assert got == want
