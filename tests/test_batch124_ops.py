"""Invariant tests for batch 124: L-moment ratios, bipartite
projection."""

from __future__ import annotations

import math

from pdal_spark.operators.graph import RA_Q, bipartite_project
from pdal_spark.operators.stats import lmoment_ratios


def test_lmoment_uniform_known_ratios(spark):
    # uniform: tau3 = 0, tau4 = 0, L-CV = 1/3 (for U(0, a) as
    # n -> inf); a 1..2000 grid gets close
    df = spark.createDataFrame([(v,) for v in range(1, 2001)],
                               "v long")
    r = lmoment_ratios(df, "v").collect()[0]
    assert abs(r["tau3"]) < 0.01
    assert abs(r["tau4"]) < 0.01
    assert abs(r["l_cv"] - 1 / 3) < 0.01
    # Hosking's approximation at tau3 = 0 gives kappa ~ 0.2846
    # (tau3 of a true Gumbel is ~0.1699, NOT 0)
    c = 2 / 3 - math.log(2) / math.log(3)
    assert abs(r["gev_kappa"] - (7.8590 * c + 2.9554 * c * c)) \
        < 0.02


def test_lmoment_right_skewed_positive_tau3(spark):
    vals = [1] * 50 + [2] * 30 + [5] * 15 + [40] * 5
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = lmoment_ratios(df, "v").collect()[0]
    assert r["tau3"] > 0.3


def test_bipartite_project_weights(spark):
    # items: 1 shared by u1,u2 (deg 2); 2 shared by all three
    rows = [(1, 1), (2, 1), (1, 2), (2, 2), (3, 2)]
    df = spark.createDataFrame(rows, "u long, r long")
    out = {(r["u"], r["v"]): r for r in
           bipartite_project(df, "u", "r").collect()}
    assert out[(1, 2)]["n_common"] == 2
    assert out[(1, 2)]["w_q"] == RA_Q // 2 + RA_Q // 3
    assert out[(1, 3)]["w_q"] == RA_Q // 3
    assert out[(2, 3)]["n_common"] == 1


def test_bipartite_hub_cap(spark):
    rows = [(u, 9) for u in range(6)] + [(0, 1), (1, 1)]
    df = spark.createDataFrame(rows, "u long, r long")
    full = bipartite_project(df, "u", "r").count()
    capped = bipartite_project(df, "u", "r",
                               max_right_degree=3).count()
    assert capped == 1 and full == 15
