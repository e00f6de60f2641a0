"""Batch-43 ops: Fellegi-Sunter weights, weighted median."""

import math

import pytest

from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# fellegi_sunter
# ---------------------------------------------------------------------------


def test_fs_informative_feature_positive_weight(spark):
    # matches agree 90%, unmatches 10%
    rows = []
    rows += [(1, 1, 1)] * 9 + [(1, 0, 0)] * 1
    rows += [(0, 1, 1)] * 1 + [(0, 0, 0)] * 9
    df = spark.createDataFrame(rows, ["is_match", "f1", "f2"])
    out = {r.feature: r for r in ops_dedup.fellegi_sunter(
        df, features=["f1"]).collect()}
    r = out["f1"]
    assert r.m == pytest.approx(0.9) and r.u == pytest.approx(0.1)
    expect = round(math.log(0.9 / 0.1), 9)
    assert r.w_agree_q == math.floor(
        expect * ops_dedup.FS_Q + 0.5
    )
    assert r.w_disagree_q < 0


def test_fs_uninformative_feature_zero_weight(spark):
    rows = [(1, 1), (1, 0), (0, 1), (0, 0)] * 5
    df = spark.createDataFrame(rows, ["is_match", "f1"])
    r = ops_dedup.fellegi_sunter(df, features=["f1"]).collect()[0]
    # m == u == 0.5 -> ln(1) = 0
    assert r.w_agree_q == 0 and r.w_disagree_q == 0


def test_fs_degenerate_feature_null(spark):
    rows = [(1, 1)] * 4 + [(0, 0)] * 4  # perfect separator
    df = spark.createDataFrame(rows, ["is_match", "f1"])
    r = ops_dedup.fellegi_sunter(df, features=["f1"]).collect()[0]
    # u = 0 -> agree weight undefined; m = 1 -> disagree undefined
    assert r.w_agree_q is None and r.w_disagree_q is None


# ---------------------------------------------------------------------------
# weighted_median
# ---------------------------------------------------------------------------


def test_weighted_median_known(spark):
    # values 1..4 with weights 1,1,5,1: cum 1,2,7,8; total 8 ->
    # first 2*cum >= 8 at value 3
    rows = [(1, v, w, i) for i, (v, w) in
            enumerate([(1, 1), (2, 1), (3, 5), (4, 1)])]
    df = spark.createDataFrame(rows, ["k", "v", "w", "id"])
    r = ops_stats.weighted_median(
        df, key="k", value="v", weight="w", id_col="id"
    ).collect()[0]
    assert r.wmedian == 3 and r.w_total == 8


def test_weighted_median_equals_plain_median_unit_weights(spark):
    rows = [(1, v, 1, i) for i, v in enumerate([9, 2, 5, 7, 4])]
    df = spark.createDataFrame(rows, ["k", "v", "w", "id"])
    r = ops_stats.weighted_median(
        df, key="k", value="v", weight="w", id_col="id"
    ).collect()[0]
    assert r.wmedian == 5


def test_weighted_median_zero_weights_dropped(spark):
    rows = [(1, 100, 0, 0), (1, 1, 1, 1), (1, 2, 1, 2)]
    df = spark.createDataFrame(rows, ["k", "v", "w", "id"])
    r = ops_stats.weighted_median(
        df, key="k", value="v", weight="w", id_col="id"
    ).collect()[0]
    assert r.wmedian == 1 and r.w_total == 2
