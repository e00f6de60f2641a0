"""Invariant tests for batch 190: edge churn, degree summary."""

from __future__ import annotations

from pdal_spark.operators.graph import degree_summary, edge_churn


def test_edge_churn_counts(spark):
    a = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                              "src long, dst long")
    b = spark.createDataFrame([(2, 1), (3, 4), (4, 5)],
                              "src long, dst long")
    r = edge_churn(a, b).collect()[0]
    assert r["n_common"] == 2  # (1,2) direction-insensitive; (3,4)
    assert r["n_added"] == 1 and r["n_removed"] == 1
    assert abs(r["jaccard"] - 0.5) < 1e-12


def test_degree_summary_star(spark):
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = degree_summary(df).collect()[0]
    assert r["n_nodes"] == 6 and r["n_edges"] == 5
    assert r["max_degree"] == 5
    # star is maximally hub-concentrated for its size
    assert abs(r["degree_gini"] - 1 / 3) < 1e-12
    ring = [(i, (i + 1) % 6) for i in range(6)]
    df2 = spark.createDataFrame(ring, "src long, dst long")
    assert degree_summary(df2).collect()[0]["degree_gini"] == 0.0
