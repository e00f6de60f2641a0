"""Sampled-Brandes betweenness: exact equality with a python
replication of the same fixed-point dependency accumulation, and
the bridge-node sanity that motivates the op."""

import itertools
from collections import defaultdict, deque

from pyspark.sql import Row

from pdal_spark.operators.graph import BC_Q, betweenness_sampled


def _edges_df(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _brute_bc(pairs, sources, depth, directed=True):
    adj = defaultdict(set)
    for a, b in pairs:
        if a == b:
            continue
        adj[a].add(b)
        if not directed:
            adj[b].add(a)
    bc = defaultdict(int)
    for s in sources:
        level = {s: 0}
        sigma = {s: 1}
        order = deque([s])
        frontier = [s]
        for t in range(1, depth + 1):
            nxt = defaultdict(int)
            for v in frontier:
                for w in adj[v]:
                    if w not in level or level.get(w) == t:
                        nxt[w] += sigma[v]
            frontier = []
            for w, sg in nxt.items():
                if w not in level:
                    level[w] = t
                    sigma[w] = sg
                    frontier.append(w)
        delta = {v: 0 for v in level}
        for t in range(depth, 0, -1):
            for v in level:
                if level[v] != t - 1:
                    continue
                acc = 0
                for w in adj[v]:
                    if level.get(w) == t:
                        acc += (sigma[v] * (BC_Q + delta[w])) \
                            // sigma[w]
                delta[v] = acc
        for v in level:
            if v != s:
                bc[v] += delta[v]
    return {v: c for v, c in bc.items()}


def test_matches_fixed_point_brandes(spark):
    # two 4-cliques joined by the bridge 3-10-4
    pairs = list(itertools.combinations(range(4), 2)) \
        + list(itertools.combinations(range(4, 8), 2)) \
        + [(3, 10), (10, 4)]
    pairs = pairs + [(b, a) for a, b in pairs]  # make it directed-sym
    sources = [0, 1, 5, 7]
    want = _brute_bc(pairs, sources, depth=4)
    got = {r.node: r.bc_q for r in betweenness_sampled(
        _edges_df(spark, pairs), sources=sources, max_depth=4,
    ).collect()}
    assert got == want
    # the bridge (and its two gateways, which every crossing path
    # also traverses) carry the most traffic; interior clique nodes
    # carry strictly less
    assert got[10] == max(got.values())
    interior = [got[v] for v in (1, 2, 5, 6) if v in got]
    assert interior and max(interior) < got[10]


def test_undirected_star_center(spark):
    pairs = [(0, i) for i in range(1, 6)]
    got = {r.node: r.bc_q for r in betweenness_sampled(
        _edges_df(spark, pairs), sources=[1, 2], max_depth=3,
        directed=False,
    ).collect()}
    want = _brute_bc(pairs, [1, 2], depth=3, directed=False)
    assert got == want
    assert got[0] == max(got.values()) and got[0] > 0


def test_absent_source_contributes_nothing(spark):
    pairs = [(0, 1), (1, 2)]
    a = betweenness_sampled(_edges_df(spark, pairs),
                            sources=[0, 99], max_depth=3)
    b = betweenness_sampled(_edges_df(spark, pairs),
                            sources=[0], max_depth=3)
    assert {(r.node, r.bc_q) for r in a.collect()} \
        == {(r.node, r.bc_q) for r in b.collect()}
