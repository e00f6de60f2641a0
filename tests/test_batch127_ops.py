"""Invariant tests for batch 127: greedy p-median."""

from __future__ import annotations

from pdal_spark.operators.knn import p_median_greedy


def _dfs(spark, demand, cands):
    d = spark.createDataFrame(demand, "did long, x long, y long,"
                              " w long")
    c = spark.createDataFrame(cands, "fid long, x long, y long")
    return d, c


def test_p_median_picks_cluster_centers(spark):
    # two demand clusters; candidate 1 sits in cluster A,
    # candidate 2 in cluster B, candidate 3 far from both
    demand = [(i, 0 + i % 3, 0, 1) for i in range(6)] \
        + [(10 + i, 100 + i % 3, 0, 1) for i in range(6)]
    cands = [(1, 1, 0), (2, 101, 0), (3, 500, 500)]
    d, c = _dfs(spark, demand, cands)
    out = sorted(p_median_greedy(d, c, k=2).collect(),
                 key=lambda r: r["sel_rank"])
    assert {out[0]["fid"], out[1]["fid"]} == {1, 2}
    # cost strictly improves with the second facility
    assert out[1]["cost"] < out[0]["cost"]


def test_p_median_weight_pulls_choice(spark):
    # one heavy demand point dominates: its nearest candidate wins
    demand = [(1, 0, 0, 100), (2, 50, 0, 1)]
    cands = [(1, 1, 0), (2, 49, 0)]
    d, c = _dfs(spark, demand, cands)
    out = p_median_greedy(d, c, k=1).collect()
    assert out[0]["fid"] == 1


def test_p_median_never_repicks(spark):
    demand = [(1, 0, 0, 1)]
    cands = [(1, 0, 0), (2, 5, 0), (3, 9, 0)]
    d, c = _dfs(spark, demand, cands)
    out = p_median_greedy(d, c, k=3).collect()
    assert len({r["fid"] for r in out}) == 3
