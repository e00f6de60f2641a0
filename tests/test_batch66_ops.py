"""Batch-66 ops: k_truss edge peeling and global Geary's C."""

import itertools

import pytest
from pyspark.sql import Row

from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators.graph import k_truss
from pdal_spark.sqlgen import qcell_pack


def _edges_df(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _cells(spark, vals, res=4):
    rows = []
    for (ix, iy), x in vals.items():
        cell = int(eval(qcell_pack(str(ix), str(iy), res)))
        rows.append((cell, x))
    return spark.createDataFrame(rows, ["cell", "x"])


def test_k_truss_keeps_clique_drops_tails(spark):
    # K5 (every edge in 3 triangles) + a pendant chain (0 triangles)
    # + dups/reversals/self-loop that must collapse.
    k5 = list(itertools.combinations(range(5), 2))
    pairs = k5 + [(4, 5), (5, 6), (6, 7), (1, 0), (3, 3)]
    got = {(r.u, r.v) for r in
           k_truss(_edges_df(spark, pairs), k=4).collect()}
    assert got == set(k5)
    # k=3 (support >= 1): still only the clique survives — chain
    # edges touch no triangle.
    got3 = {(r.u, r.v) for r in
            k_truss(_edges_df(spark, pairs), k=3).collect()}
    assert got3 == set(k5)
    # k above the max truss -> empty (K5 edges have support 3 < 4).
    assert k_truss(_edges_df(spark, pairs), k=6).count() == 0


def test_k_truss_cascading_peel(spark):
    # Two triangles sharing edge (0,1): every edge has support >= 1,
    # but edge (0,1) has support 2. At k=4 (need 2): round 1 deletes
    # the four outer edges, round 2 then deletes (0,1) — a genuine
    # cascade the fixed-round oracle must follow.
    pairs = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    assert k_truss(_edges_df(spark, pairs), k=4).count() == 0


def test_gate_ktruss_rounds_budget_is_a_fixpoint(spark):
    """One more round than the gate budget removes nothing on the
    gate's own sf0.001 + sf0.01 fixtures."""
    import pdal_spark.gates.gate_ext12 as g12
    import pdal_spark.gates.gate_ext66 as g66

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        edges = g12._kc_edges(spark, sf)
        a = {(r.u, r.v) for r in k_truss(
            edges, k=g66._KT_K, max_rounds=g66._KT_ROUNDS).collect()}
        b = {(r.u, r.v) for r in k_truss(
            edges, k=g66._KT_K, max_rounds=g66._KT_ROUNDS + 1).collect()}
        assert a == b and len(a) > 0


def _brute_geary(vals):
    # queen adjacency on the integer lattice
    n = len(vals)
    xs = list(vals.values())
    mean = sum(xs) / n
    den = sum((x - mean) ** 2 for x in xs)
    num = 0.0
    w = 0
    for (ix, iy), xi in vals.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nb = (ix + dx, iy + dy)
                if nb in vals:
                    w += 1
                    num += (xi - vals[nb]) ** 2
    return (n - 1) * num / (2 * w * den)


def test_geary_c_matches_brute_force_and_polarity(spark):
    # checkerboard -> dispersed (C > 1); blocks -> clustered (C < 1)
    cb = {(ix, iy): 10 if (ix + iy) % 2 == 0 else 0
          for ix in range(4, 8) for iy in range(4, 8)}
    r = ops_stats.geary_c(_cells(spark, cb), res=4).collect()[0]
    assert r.geary_c == pytest.approx(_brute_geary(cb))
    assert r.geary_c > 1.0

    blocks = {(ix, iy): (10 if ix < 6 else 0)
              for ix in range(4, 8) for iy in range(4, 8)}
    r2 = ops_stats.geary_c(_cells(spark, blocks), res=4).collect()[0]
    assert r2.geary_c == pytest.approx(_brute_geary(blocks))
    assert r2.geary_c < 1.0


def test_geary_c_constant_field_null(spark):
    const = {(ix, iy): 7 for ix in range(4, 7) for iy in range(4, 7)}
    r = ops_stats.geary_c(_cells(spark, const), res=4).collect()[0]
    assert r.geary_c is None and r.den == 0
