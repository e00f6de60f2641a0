"""Invariant tests for batch 140: power-law alpha, edge
reciprocity."""

from __future__ import annotations

import math

from pdal_spark.operators.graph import edge_reciprocity, powerlaw_alpha


def test_powerlaw_alpha_matches_direct_formula(spark):
    # star + chain mixture, compute alpha by hand from degrees
    edges = [(0, i) for i in range(1, 9)] + [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = powerlaw_alpha(df, d_min=2).collect()[0]
    # degrees: node0=8, node1=2, node2=3, node3=2 -> tail {8,2,3,2}
    degs = [8, 2, 3, 2]
    want = 1 + len(degs) / sum(math.log(d / 1.5) for d in degs)
    assert abs(r["alpha"] - want) < 0.01
    assert r["n_tail"] == 4


def test_edge_reciprocity_values(spark):
    edges = [(1, 2), (2, 1), (1, 3), (3, 4), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = edge_reciprocity(df).collect()[0]
    assert r["n_edges"] == 5 and r["n_mutual"] == 4
    assert abs(r["reciprocity"] - 0.8) < 1e-12


def test_edge_reciprocity_oneway_zero(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert edge_reciprocity(df).collect()[0]["reciprocity"] == 0.0
