"""Invariant tests for batch 131: Kendall's W, Lin's CCC, beta
diversity."""

from __future__ import annotations

from pdal_spark.operators.stats import kendalls_w, lins_ccc
from pdal_spark.operators.textops import beta_diversity


def test_kendalls_w_perfect_agreement(spark):
    # 3 raters, identical rankings of 4 items -> W = 1
    rows = [(i, j, j * 10) for i in range(3) for j in range(1, 5)]
    df = spark.createDataFrame(rows, "i long, j long, v long")
    r = kendalls_w(df, "i", "j", "v").collect()[0]
    assert r["m"] == 3 and r["n"] == 4
    assert abs(r["w"] - 1.0) < 1e-12


def test_kendalls_w_opposed_raters_low(spark):
    rows = [(0, j, j) for j in range(1, 5)] \
        + [(1, j, -j) for j in range(1, 5)]
    df = spark.createDataFrame(rows, "i long, j long, v long")
    r = kendalls_w(df, "i", "j", "v").collect()[0]
    assert r["w"] < 0.05


def test_lins_ccc_identity_is_one_shift_penalized(spark):
    rows = [(v, v) for v in range(50)]
    df = spark.createDataFrame(rows, "xv long, yv long")
    assert lins_ccc(df, "xv", "yv").collect()[0]["ccc"] == 1.0
    shifted = spark.createDataFrame(
        [(v, v + 30) for v in range(50)], "xv long, yv long"
    )
    r = lins_ccc(shifted, "xv", "yv").collect()[0]
    assert 0 < r["ccc"] < 0.7   # perfect Pearson, penalized CCC


def test_beta_diversity_bounds(spark):
    # identical parts -> beta 1; disjoint parts -> beta = n_parts
    same = [(p, s) for p in range(3) for s in (1, 2, 3)]
    d1 = spark.createDataFrame(same, "p long, s long")
    assert beta_diversity(d1, "p", "s").collect()[0]["beta_w"] \
        == 1.0
    disjoint = [(p, p * 10 + s) for p in range(3) for s in (1, 2)]
    d2 = spark.createDataFrame(disjoint, "p long, s long")
    assert beta_diversity(d2, "p", "s").collect()[0]["beta_w"] \
        == 3.0
