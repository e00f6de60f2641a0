"""Third batch of reference-independent pins (graph + eval
families): textbook/worked-example literals — the Wikipedia Cohen's
kappa 0.4 table, complete-graph clustering, hand-enumerated AUC and
Mann-Kendall extremes — independent of the cross-engine hashes."""

from __future__ import annotations


def test_triangles_complete_graph_k4(spark):
    """K4: every node has degree 3, sits in 3 triangles, and has
    local clustering coefficient exactly 1 (lcc_q = 10^6)."""
    from pdal_spark.operators.graph import triangle_stats

    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = triangle_stats(df).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["degree"] == 3
        assert r["triangles"] == 3
        assert r["lcc_q"] == 10**6


def test_kcore_triangle_with_pendant(spark):
    """Triangle {0,1,2} + pendant 3-0: the 2-core is exactly the
    triangle, each surviving with core degree 2."""
    from pdal_spark.operators.graph import kcore

    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 0)], "src long, dst long"
    )
    out = {r["node"]: r["core_degree"]
           for r in kcore(df, k=2).collect()}
    assert out == {0: 2, 1: 2, 2: 2}


def test_cohen_kappa_worked_example(spark):
    """The classic 2x2 worked example (confusion [[20,5],[10,15]],
    n=50): po=35, pe-hat=0.5 -> kappa = (0.7-0.5)/(1-0.5) = 0.4."""
    from pdal_spark.operators.stats import cohen_kappa

    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15)
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r["n"] == 50 and r["po"] == 35
    assert abs(r["kappa"] - 0.4) < 1e-12


def test_auc_exact_hand_enumerated(spark):
    """pos scores {3, 2}, neg scores {2, 1}: pairwise wins
    1+1+0.5+1 = 3.5 of 4 -> AUC = 0.875; perfect separation -> 1."""
    from pdal_spark.operators.stats import auc_exact

    df = spark.createDataFrame(
        [(3.0, 1), (2.0, 1), (2.0, 0), (1.0, 0)],
        "s double, y int",
    )
    r = auc_exact(df, "s", "y").collect()[0]
    assert abs(r["auc"] - 0.875) < 1e-12
    perfect = spark.createDataFrame(
        [(5.0, 1), (4.0, 1), (2.0, 0), (1.0, 0)], "s double, y int"
    )
    assert abs(auc_exact(perfect, "s", "y")
               .collect()[0]["auc"] - 1.0) < 1e-12


def test_mann_kendall_monotone_extremes(spark):
    """Strictly increasing n=5: S = C(5,2) = 10 and
    var18 = n(n-1)(2n+5) = 300; strictly decreasing: S = -10."""
    from pdal_spark.operators.temporal import mann_kendall

    inc = [(0, t, t * 2) for t in range(5)]
    dec = [(0, t, 100 - t) for t in range(5)]
    r1 = mann_kendall(
        spark.createDataFrame(inc, "k long, o long, v long"),
        key="k", order="o", value="v").collect()[0]
    assert r1["s_stat"] == 10 and r1["var18"] == 300
    r2 = mann_kendall(
        spark.createDataFrame(dec, "k long, o long, v long"),
        key="k", order="o", value="v").collect()[0]
    assert r2["s_stat"] == -10


def test_harmonic_centrality_star_and_chain(spark):
    """Star seed->3 leaves: hc = 3/1; chain seed->a->b:
    hc = 1 + 1/2 (exact in the 2^-20 grid)."""
    from pdal_spark.operators.graph import HC_Q, harmonic_centrality

    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    r = harmonic_centrality(star, seeds=[0]).collect()[0]
    assert r["n_reached"] == 3 and r["hc_q"] == 3 * HC_Q
    chain = spark.createDataFrame(
        [(0, 1), (1, 2)], "src long, dst long"
    )
    r2 = harmonic_centrality(chain, seeds=[0]).collect()[0]
    assert r2["n_reached"] == 2
    assert r2["hc_q"] == HC_Q + HC_Q // 2
