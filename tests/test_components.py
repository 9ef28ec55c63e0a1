"""Distributed connected components vs a union-find oracle.

Graph shapes chosen to stress the algorithm, not the corpus: a long
path (maximal diameter — the case naive min-label propagation cannot
do in bounded rounds), cliques (the dedup-cluster shape), random
Erdos-Renyi graphs at several densities, stars already in fixpoint
form, reversed/duplicated/self-loop edges, and the empty graph.
"""
import random

import pytest


def _union_find_components(edges, nodes=None):
    """Exact oracle: component label = min node id, via union-find."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)
    for n in nodes or []:
        parent.setdefault(n, n)
    return {n: find(n) for n in parent}


def _run_cc(spark, edges, driver_threshold=0):
    # threshold 0 by default HERE: these stress tests exist to gate the
    # distributed large-star/small-star loop, which the small-graph
    # driver fast path would otherwise bypass on every one of them
    from streaming_algorithms_spark.operators.components import (
        connected_components,
    )

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    got = connected_components(df, driver_threshold=driver_threshold)
    return {r["node"]: r["component"] for r in got.collect()}


def test_cc_path_graph_converges_logarithmically(spark):
    # 200-node path: diameter 199. Naive propagation needs 199 rounds;
    # large-star/small-star must finish inside the 24-round guard.
    edges = [(i, i + 1) for i in range(200)]
    assert _run_cc(spark, edges) == _union_find_components(edges)


def test_cc_cliques_and_isolated_pairs(spark):
    edges = [(a, b) for a in range(10) for b in range(a + 1, 10)]  # clique
    edges += [(100 + 2 * i, 101 + 2 * i) for i in range(20)]  # pairs
    edges += [(1000, 2000), (2000, 3000), (1000, 3000)]  # triangle
    assert _run_cc(spark, edges) == _union_find_components(edges)


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for density in (0.5, 2.0):
        n = 120
        m = int(n * density)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [e for e in edges if e[0] != e[1]]
        assert _run_cc(spark, edges) == _union_find_components(edges), (
            f"density {density}")


def test_cc_tolerates_duplicates_reversals_and_self_loops(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (2, 4), (5, 6)]
    # self-loop (3,3) contributes no component membership
    want = _union_find_components([(1, 2), (2, 4), (5, 6)])
    assert _run_cc(spark, edges) == want


def test_cc_star_fixpoint_input(spark):
    edges = [(0, i) for i in range(1, 30)]
    assert _run_cc(spark, edges) == _union_find_components(edges)


def test_cc_empty_edges(spark):
    assert _run_cc(spark, []) == {}
    assert _run_cc(spark, [], driver_threshold=1000) == {}


def test_cc_driver_fastpath_matches_distributed_loop(spark):
    # default-threshold fast path and forced distributed loop must agree
    # with each other and the oracle on path / clique / random shapes
    rng = random.Random(11)
    shapes = [
        [(i, i + 1) for i in range(50)],
        [(a, b) for a in range(8) for b in range(a + 1, 8)],
        [(rng.randrange(80), rng.randrange(80)) for _ in range(160)],
    ]
    for edges in shapes:
        edges = [e for e in edges if e[0] != e[1]]
        want = _union_find_components(edges)
        assert _run_cc(spark, edges, driver_threshold=65536) == want
        assert _run_cc(spark, edges, driver_threshold=0) == want


def test_cc_threshold_boundary_routes_to_loop(spark):
    # exactly-at-threshold takes the fast path; one-over takes the loop —
    # both produce identical labels
    edges = [(i, i + 1) for i in range(10)]  # 10 canonical edges
    want = _union_find_components(edges)
    assert _run_cc(spark, edges, driver_threshold=10) == want
    assert _run_cc(spark, edges, driver_threshold=9) == want


def test_dedup_resolve_min_id_and_quality(spark):
    from streaming_algorithms_spark.operators.components import dedup_resolve

    docs = spark.createDataFrame(
        [(i, float(i % 5)) for i in range(12)], "doc_id long, q double"
    )
    # clusters {0,1,2}, {3,4}; 5..11 isolated
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
    )
    res = {r["doc_id"]: (r["component"], r["is_canonical"])
           for r in dedup_resolve(docs, pairs, "doc_id").collect()}
    assert len(res) == 12
    assert res[0] == (0, True) and res[1] == (0, False) and res[2] == (0, False)
    assert res[3] == (3, True) and res[4] == (3, False)
    assert all(res[i] == (i, True) for i in range(5, 12))

    # quality-based: cluster {0,1,2} has q = 0,1,2 -> keep doc 2;
    # cluster {3,4} has q = 3,4 -> keep doc 4
    resq = {r["doc_id"]: (r["component"], r["is_canonical"])
            for r in dedup_resolve(docs, pairs, "doc_id",
                                   quality_col="q").collect()}
    assert resq[2] == (0, True) and resq[0] == (0, False)
    assert resq[4] == (3, True) and resq[3] == (3, False)
    # quality ties prefer the smaller id: docs 5 and 10 share q=0.0 but
    # are isolated, each canonical of itself
    assert resq[5] == (5, True) and resq[10] == (10, True)


def test_dedup_resolve_quality_tie_prefers_min_id(spark):
    from streaming_algorithms_spark.operators.components import dedup_resolve

    docs = spark.createDataFrame(
        [(7, 1.0), (8, 1.0), (9, 1.0)], "doc_id long, q double"
    )
    pairs = spark.createDataFrame([(7, 8), (8, 9)], "id_a long, id_b long")
    res = {r["doc_id"]: r["is_canonical"]
           for r in dedup_resolve(docs, pairs, "doc_id",
                                  quality_col="q").collect()}
    assert res == {7: True, 8: False, 9: False}


def test_cc_round_guard_raises_not_hangs(spark):
    from streaming_algorithms_spark.operators.components import (
        connected_components,
    )

    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_rounds=0, driver_threshold=0)
