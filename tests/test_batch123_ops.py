"""Invariant tests for batch 123: Gumbel L-moments, mean excess."""

from __future__ import annotations

import math
import random

from pdal_spark.operators.stats import gumbel_lmoments, mean_excess


def test_gumbel_recovers_planted_parameters(spark):
    # deterministic Gumbel sample via inverse CDF on a fixed grid
    mu, beta = 100.0, 20.0
    vals = [
        int(round(mu - beta * math.log(-math.log((i + 0.5) / 400))))
        for i in range(400)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = gumbel_lmoments(df, "v").collect()[0]
    assert abs(r["mu"] - mu) < 3
    assert abs(r["beta"] - beta) < 2
    # return levels ordered and above the location
    assert r["rl100"] > r["rl10"] > r["mu"]


def test_gumbel_return_level_closed_form(spark):
    df = spark.createDataFrame([(v,) for v in range(1, 101)],
                               "v long")
    r = gumbel_lmoments(df, "v").collect()[0]
    k10 = -math.log(-math.log(0.9))
    assert abs(r["rl10"] - (r["mu"] + r["beta"] * k10)) < 1e-9


def test_mean_excess_exact(spark):
    vals = [1, 5, 10, 20]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = {r["u"]: r for r in
           mean_excess(df, "v", thresholds=[0, 4, 15]).collect()}
    assert out[0]["n_exc"] == 4 and out[0]["sum_exc"] == 36
    assert out[4]["n_exc"] == 3 and out[4]["sum_exc"] == 23
    assert out[15]["n_exc"] == 1 and out[15]["me"] == 5.0
