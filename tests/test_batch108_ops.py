"""Invariant tests for batch 108: Katz/eigenvector centrality,
Markov entropy rate, Allan variance."""

from __future__ import annotations

from pdal_spark.operators.graph import (
    EIG_SCALE,
    eigenvector_centrality,
    katz_centrality,
)
from pdal_spark.operators.temporal import (
    allan_variance,
    markov_entropy_rate,
)


def test_katz_star_center_wins(spark):
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["katz_q"]
           for r in katz_centrality(df).collect()}
    assert out[0] > out[1]
    assert len(set(out[i] for i in range(1, 6))) == 1  # symmetric


def test_eigenvector_max_normalized(spark):
    edges = [(0, i) for i in range(1, 6)] + [(1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["eig_q"]
           for r in eigenvector_centrality(df).collect()}
    assert max(out.values()) == EIG_SCALE  # hub pinned at scale
    assert out[0] == EIG_SCALE
    assert out[3] < out[1]  # leaf vs triangle member


def test_markov_entropy_deterministic_chain_is_zero(spark):
    # A->B->A->B...: every state has exactly one successor -> H = 0
    rows = [(1, i, "A" if i % 2 == 0 else "B") for i in range(20)]
    df = spark.createDataFrame(rows, "k long, o long, st string")
    r = markov_entropy_rate(df, "k", "o", "st").collect()[0]
    assert r["h"] == 0.0 and r["n_transitions"] == 19


def test_markov_entropy_uniform_two_way(spark):
    # from A both successors equally likely -> H = ln(2) * share
    seq = "AABABBAABABBAABABB"  # deterministic mixed chain
    rows = [(1, i, c) for i, c in enumerate(seq)]
    df = spark.createDataFrame(rows, "k long, o long, st string")
    r = markov_entropy_rate(df, "k", "o", "st").collect()[0]
    assert r["h"] is not None and r["h"] > 0.4


def test_allan_variance_linear_drift(spark):
    # pure linear ramp: bin-sum diffs are tau^2 exactly ->
    # avar = tau^2 / (2 tau^2) = 0.5 for every tau
    df = spark.createDataFrame(
        [(i, i) for i in range(256)], "o long, v long"
    )
    rows = allan_variance(df, "o", "v", taus=[4, 16]).collect()
    for r in rows:
        # linear drift: bin-mean diffs are exactly tau -> tau^2/2
        assert abs(r["avar"] - r["tau"] * r["tau"] / 2.0) < 1e-12


def test_allan_variance_drops_partial_bins(spark):
    df = spark.createDataFrame(
        [(i, 1) for i in range(10)], "o long, v long"
    )
    r = {x["tau"]: x for x in
         allan_variance(df, "o", "v", taus=[4]).collect()}
    assert r[4]["m_bins"] == 2  # 10 rows -> 2 complete bins of 4
    assert r[4]["sum_sq"] == 0
