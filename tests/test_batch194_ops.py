"""Invariant tests for batch 194: Erlang-B, M/G/1 wait."""

from __future__ import annotations

from pdal_spark.operators.stats import erlang_b, mg1_wait


def test_erlang_b_known(spark):
    # a = 1, c = 1: B = 1/(1+1) = 0.5; c = 2: B = 0.5/(2+0.5) = 0.2
    df = spark.createDataFrame([(10, 10, 1), (10, 10, 2)],
                               "lam long, mu long, c long")
    out = {r["c"]: r for r in erlang_b(
        df, "lam", "mu", "c").collect()}
    assert abs(out[1]["p_block_r"] - 0.5) < 1e-9
    assert abs(out[2]["p_block_r"] - 0.2) < 1e-9


def test_mg1_deterministic_vs_bursty(spark):
    # same mean service, different variance -> bursty waits longer
    det = [(0, 10)] * 100
    bursty = [(1, 1)] * 90 + [(1, 91)] * 10
    df = spark.createDataFrame(det + bursty, "k long, s long")
    out = {r["k"]: r for r in mg1_wait(
        df, "k", "s", arrival_rate_num=1,
        arrival_rate_den=20).collect()}
    assert abs(out[0]["rho"] - 0.5) < 1e-9
    assert out[1]["wq"] > 3 * out[0]["wq"]
