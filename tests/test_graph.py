"""Invariant tests for the web-graph analytics ops (operators/graph):
exact triangle counting vs a brute-force local enumeration, k-core
peeling fixpoint (the fixed `rounds` budget used by the gate really
reaches the true k-core), and HITS sanity on a known hub/authority
shape."""

from __future__ import annotations

import itertools

from pyspark.sql import Row

from pdal_spark.operators.graph import (
    adamic_adar,
    hits,
    kcore,
    triangle_stats,
)

_GN = 48
_GM = 19


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs]
    )


def _brute_triangles(pairs):
    """Per-node triangle counts over the simple undirected graph."""
    es = {
        (min(a, b), max(a, b)) for a, b in pairs if a != b
    }
    nodes = sorted({n for e in es for n in e})
    count = {n: 0 for n in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in es and (x, z) in es and (y, z) in es:
            count[x] += 1
            count[y] += 1
            count[z] += 1
    deg = {n: 0 for n in nodes}
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
    return es, deg, count


def test_triangle_stats_matches_brute_force(spark):
    # K5 glued to a square plus pendant edges and noise: exercises
    # dense cliques, triangle-free cycles, degree-1 nodes, self-loops
    # and duplicate/reversed edges (which must all collapse).
    pairs = (
        list(itertools.combinations(range(5), 2))     # K5
        + [(4, 5), (5, 6), (6, 7), (7, 4)]            # square sharing node 4
        + [(0, 8), (8, 8), (1, 0), (0, 1), (2, 1)]    # pendant, loop, dups
    )
    es, deg, count = _brute_triangles(pairs)
    got = {
        r["node"]: (r["degree"], r["triangles"], r["lcc_q"])
        for r in triangle_stats(_edges_df(spark, pairs)).collect()
    }
    assert set(got) == set(deg)
    for n in deg:
        d, t, lcc = got[n]
        assert (d, t) == (deg[n], count[n]), n
        want_lcc = (2 * count[n] * 10**6) // (d * (d - 1)) if d >= 2 else 0
        assert lcc == want_lcc, n


def test_kcore_peeling_reaches_fixpoint(spark):
    # A 4-clique (the 3-core) with a chain of tails whose peeling
    # takes several rounds: 3-0-... tails force cascading removals.
    pairs = list(itertools.combinations(range(4), 2)) + [
        (3, 4), (4, 5), (5, 6), (6, 7),
    ]
    got = {
        r["node"]: r["core_degree"]
        for r in kcore(_edges_df(spark, pairs), k=3, rounds=6).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # k above the max core -> empty
    assert kcore(_edges_df(spark, pairs), k=4, rounds=6).count() == 0


def test_gate_kcore_rounds_budget_is_a_fixpoint(spark):
    """The gate peels a fixed number of rounds; prove one more round
    removes nothing on the gate's own sf0.01 fixture."""
    import pdal_spark.gates.gate_ext12 as g12

    edges = g12._kc_edges(spark, "/root/testdata/sf0.01")
    at_budget = kcore(edges, k=g12._KC_K, rounds=g12._KC_ROUNDS)
    one_more = kcore(edges, k=g12._KC_K, rounds=g12._KC_ROUNDS + 1)
    a = {(r["node"], r["core_degree"]) for r in at_budget.collect()}
    b = {(r["node"], r["core_degree"]) for r in one_more.collect()}
    assert a == b and len(a) > 0


def test_hits_separates_hubs_from_authorities(spark):
    # Bipartite directed graph: hubs {0,1} point at authorities
    # {10,11,12}; hub 0 covers all three, hub 1 covers one.
    pairs = [(0, 10), (0, 11), (0, 12), (1, 10)]
    got = {r["node"]: (r["hub"], r["auth"]) for r in
           hits(_edges_df(spark, pairs), iters=3).collect()}
    scale = 10**6
    # hub 0 dominates hubs (renorm -> exactly scale); pure
    # authorities have hub score 0 and vice versa.
    assert got[0][0] == scale and got[0][1] == 0
    assert 0 < got[1][0] < scale and got[1][1] == 0
    assert got[10][1] == scale and got[10][0] == 0
    assert got[11][1] == got[12][1] and 0 < got[11][1] < scale


def test_hits_is_partitioning_invariant(spark):
    # Integer arithmetic must give bit-identical scores regardless of
    # input partitioning.
    pairs = [(i % 7, (i * 13 + 3) % 11) for i in range(120)]
    a = hits(_edges_df(spark, pairs).repartition(1), iters=3)
    b = hits(_edges_df(spark, pairs).repartition(16), iters=3)
    ra = {tuple(r) for r in a.collect()}
    rb = {tuple(r) for r in b.collect()}
    assert ra == rb


def _brute_adamic_adar(pairs, max_degree=None):
    import math

    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, ns in adj.items():
        if len(ns) < 2:
            continue
        if max_degree is not None and len(ns) > max_degree:
            continue
        term = int(math.floor(10**6 / math.log(len(ns))))
        for u in ns:
            for w in ns:
                if u < w and (u, w) not in es:
                    cn, aa = out.get((u, w), (0, 0))
                    out[(u, w)] = (cn + 1, aa + term)
    return out


def test_adamic_adar_matches_brute_force(spark):
    pairs = list(itertools.combinations(range(5), 2)) + [
        (4, 5), (5, 6), (6, 7), (7, 4), (0, 8), (8, 9), (1, 0),
    ]
    want = _brute_adamic_adar(pairs)
    got = {
        (r["u"], r["w"]): (r["cn"], r["aa_q"])
        for r in adamic_adar(_edges_df(spark, pairs)).collect()
    }
    assert got == want


def test_adamic_adar_max_degree_drops_hub_centers(spark):
    # star center 0 with 6 leaves + an edge pair elsewhere
    pairs = [(0, i) for i in range(1, 7)] + [(1, 2), (10, 11), (11, 12)]
    want = _brute_adamic_adar(pairs, max_degree=3)
    got = {
        (r["u"], r["w"]): (r["cn"], r["aa_q"])
        for r in adamic_adar(
            _edges_df(spark, pairs), max_degree=3
        ).collect()
    }
    assert got == want
    # uncapped result DOES contain hub-centered pairs
    full = adamic_adar(_edges_df(spark, pairs)).count()
    assert full > len(got)


def _brute_ppr(pairs, seeds, iters, scale=10**12):
    de = sorted({(a, b) for a, b in pairs if a != b})
    outdeg = {}
    for a, _ in de:
        outdeg[a] = outdeg.get(a, 0) + 1
    nodes = sorted({n for e in de for n in e})
    tele = (scale * 15) // 100
    r = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        nxt = {n: (tele if n in seeds else 0) for n in nodes}
        for a, b in de:
            nxt[b] += (r[a] * 85) // (100 * outdeg[a])
        r = nxt
    return r


def test_personalized_pagerank_matches_reference(spark):
    from pdal_spark.operators.graph import personalized_pagerank

    pairs = [(i % 9, (i * 5 + 2) % 9) for i in range(40)] + [(20, 21)]
    seeds = [0, 20]
    want = _brute_ppr(pairs, set(seeds), iters=3)
    df = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs]
    )
    got = {
        r["node"]: r["ppr"]
        for r in personalized_pagerank(df, seeds, iters=3).collect()
    }
    assert got == want
    # mass concentrates near seeds: a node unreachable from any seed
    # and not a seed gets rank 0 after teleport-only iterations
    assert got[21] > 0 and all(v >= 0 for v in got.values())


def _brute_lpa(pairs, rounds):
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, ns in adj.items():
            cnt = {}
            for m in ns:
                cnt[lbl[m]] = cnt.get(lbl[m], 0) + 1
            nxt[n] = min(cnt, key=lambda c: (-cnt[c], c))
        lbl = nxt
    return lbl


def test_label_propagation_matches_reference(spark):
    from pdal_spark.operators.graph import label_propagation

    # two K4 cliques bridged by one edge + a pendant chain
    pairs = (
        list(itertools.combinations(range(4), 2))
        + list(itertools.combinations(range(10, 14), 2))
        + [(3, 10), (13, 20), (20, 21)]
    )
    for rounds in (1, 3):
        want = _brute_lpa(pairs, rounds)
        got = {
            r["node"]: r["community"]
            for r in label_propagation(
                _edges_df(spark, pairs), rounds=rounds
            ).collect()
        }
        assert got == want, rounds
    # the two cliques end in different communities
    final = _brute_lpa(pairs, 3)
    assert {final[i] for i in range(4)} != {final[i] for i in range(10, 14)}


def _brute_bfs(pairs, seeds, depth, directed=True):
    adj = {}
    for a, b in {(a, b) for a, b in pairs if a != b}:
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    lvl = {s: 0 for s in seeds}
    frontier = set(seeds)
    for i in range(1, depth + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in lvl:
                    lvl[m] = i
                    nxt.add(m)
        frontier = nxt
    return lvl


def test_bfs_levels_matches_reference(spark):
    from pdal_spark.operators.graph import bfs_levels

    pairs = [(i % 11, (i * 3 + 1) % 11) for i in range(30)] + [
        (50, 51), (51, 52),
    ]
    for directed in (True, False):
        want = _brute_bfs(pairs, [0, 50], 4, directed)
        got = {
            r["node"]: r["level"]
            for r in bfs_levels(
                _edges_df(spark, pairs), seeds=[0, 50],
                max_depth=4, directed=directed,
            ).collect()
        }
        assert got == want, directed
