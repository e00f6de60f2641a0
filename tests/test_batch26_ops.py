"""Batch-26 ops: gini, category_entropy."""

import math

import pytest

from pdal_spark.operators import stats as ops_stats


def test_gini_equal_vs_concentrated(spark):
    rows = [("eq", 10.0)] * 10
    rows += [("conc", 0.0)] * 9 + [("conc", 100.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r.g: r.gini for r in
           ops_stats.gini(df, "g", "v").collect()}
    assert out["eq"] == pytest.approx(0.0, abs=1e-12)
    assert out["conc"] == pytest.approx(0.9, abs=1e-9)


def test_category_entropy_uniform_vs_single(spark):
    rows = [(1, c) for c in ["a", "b", "c", "d"] * 4]  # uniform 4-way
    rows += [(2, "a")] * 16  # single category
    df = spark.createDataFrame(rows, ["uid", "cat"])
    out = {r.uid: r for r in
           ops_stats.category_entropy(df, "uid", "cat").collect()}
    assert out[1].entropy == pytest.approx(math.log(4.0), abs=1e-5)
    assert out[2].entropy == pytest.approx(0.0, abs=1e-5)
    assert out[1].n_cats == 4 and out[2].n_cats == 1
