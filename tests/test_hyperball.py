"""HyperBall invariants: the iterated registers at (v, t) must be
IDENTICAL to hll_estimate() run on the exact ball membership set —
the defining property of the algorithm (register union distributes
over set union) — plus growth monotonicity and fixture sanity."""

from pyspark.sql import Row

from pdal_spark.operators.graph import hyperball
from pdal_spark.operators.sketch import hll_estimate


def _edges_df(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _exact_balls(pairs, depth):
    adj = {}
    nodes = set()
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        nodes.update((a, b))
    balls = {(v, 0): {v} for v in nodes}
    for t in range(1, depth + 1):
        for v in nodes:
            b = set(balls[(v, t - 1)])
            for u in adj.get(v, ()):
                b |= balls[(u, t - 1)]
            balls[(v, t)] = b
    return nodes, balls


def test_hyperball_registers_match_exact_ball_hll(spark):
    # directed graph with a hub, a chain, and a cycle — balls of
    # very different shapes and growth rates
    pairs = [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5), (5, 3),
             (2, 6), (6, 7), (7, 8), (8, 9), (9, 6), (1, 0)]
    depth = 3
    nodes, balls = _exact_balls(pairs, depth)
    got = {
        (r.node, r.t): (r.n_used, r.sum_q, r.ball_est)
        for r in hyperball(_edges_df(spark, pairs),
                           max_depth=depth).collect()
    }
    assert set(got) == {(v, t) for v in nodes
                        for t in range(depth + 1)}
    for (v, t), members in balls.items():
        mdf = spark.createDataFrame([Row(m=int(x)) for x in members])
        want = hll_estimate(mdf, "m").collect()[0]
        n_used, sum_q, est = got[(v, t)]
        assert (n_used, sum_q) == (want.n_used, want.sum_q), (v, t)
        assert est == want.hll_est, (v, t)


def test_hyperball_growth_monotone_and_undirected(spark):
    # path 0-1-2-3-4: directed balls grow one hop right per round;
    # undirected balls grow both ways
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    out = hyperball(_edges_df(spark, pairs), max_depth=4).collect()
    by_node = {}
    for r in out:
        by_node.setdefault(r.node, {})[r.t] = r.sum_q
    for v, seq in by_node.items():
        # registers only grow -> sum_q (2^(K-rho) mass) only shrinks
        for t in range(1, 5):
            assert seq[t] <= seq[t - 1], (v, t)
    # node 0 reaches all 5 within 4 hops: its t=4 registers must
    # equal the full node-set sketch; node 4 (no out-edges) stays
    # a singleton in the directed graph
    assert by_node[0][4] < by_node[4][4]
    und = hyperball(_edges_df(spark, pairs), max_depth=4,
                    directed=False).collect()
    u = {(r.node, r.t): r.sum_q for r in und}
    assert u[(4, 4)] == u[(0, 4)]  # both reach the whole path
