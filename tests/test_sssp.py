"""weighted_sssp: exact Dijkstra equality on a known graph,
unweighted = BFS hops, and gate-budget fixpoint on the fixture."""

import heapq
from collections import defaultdict

from pyspark.sql import Row

from pdal_spark.operators.graph import weighted_sssp


def _edges_df(spark, triples):
    return spark.createDataFrame(
        [Row(src=a, dst=b, w=w) for a, b, w in triples]
    )


def _dijkstra(triples, s, directed=True):
    adj = defaultdict(list)
    for a, b, w in triples:
        adj[a].append((b, w))
        if not directed:
            adj[b].append((a, w))
    dist = {s: 0}
    pq = [(0, s)]
    while pq:
        d, v = heapq.heappop(pq)
        if d > dist.get(v, 1 << 62):
            continue
        for u, w in adj[v]:
            nd = d + w
            if nd < dist.get(u, 1 << 62):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))
    return dist


def test_matches_dijkstra_weighted(spark):
    # heavier direct edge vs lighter two-hop detour (BF must prefer
    # the detour), a cycle, and parallel edges collapsing to min w
    triples = [(0, 1, 10), (0, 2, 3), (2, 1, 3), (1, 3, 1),
               (3, 0, 2), (2, 3, 8), (0, 2, 5), (2, 4, 1)]
    want = _dijkstra(triples, 0)
    got = {r.node: r.dist for r in weighted_sssp(
        _edges_df(spark, triples), sources=[0], rounds=8,
        weight="w").collect()}
    assert got == want
    assert got[1] == 6  # via the 3+3 detour, not the 10 direct


def test_unweighted_is_bfs_hops(spark):
    triples = [(0, 1, 99), (1, 2, 99), (2, 3, 99), (0, 3, 99)]
    got = {r.node: r.dist for r in weighted_sssp(
        _edges_df(spark, triples).select("src", "dst"),
        sources=[0], rounds=5).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1}


def test_gate_rounds_budget_is_a_fixpoint(spark):
    import pdal_spark.gates.gate_ext72 as g72

    e = g72._sp_edges(spark, "/root/testdata/sf0.01")
    a = {(r.seed, r.node): r.dist for r in weighted_sssp(
        e, sources=g72._SP_SOURCES, rounds=g72._SP_ROUNDS,
        weight="w").collect()}
    b = {(r.seed, r.node): r.dist for r in weighted_sssp(
        e, sources=g72._SP_SOURCES, rounds=g72._SP_ROUNDS + 1,
        weight="w").collect()}
    assert a == b and len(a) > 0
