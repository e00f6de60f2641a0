"""Invariant tests for batch 110: AUC, log loss, lift curve."""

from __future__ import annotations

import math

from pdal_spark.operators.stats import auc_exact, lift_curve, log_loss


def test_auc_perfect_separation(spark):
    rows = [(s, 1 if s >= 5 else 0) for s in range(10)]
    df = spark.createDataFrame(rows, "v long, y long")
    assert auc_exact(df, "v", "y").collect()[0]["auc"] == 1.0


def test_auc_ties_give_half_credit(spark):
    # all scores equal -> AUC = 0.5 exactly
    rows = [(7, 1), (7, 1), (7, 0), (7, 0)]
    df = spark.createDataFrame(rows, "v long, y long")
    assert auc_exact(df, "v", "y").collect()[0]["auc"] == 0.5


def test_auc_empty_class_null(spark):
    df = spark.createDataFrame([(1, 1), (2, 1)], "v long, y long")
    assert auc_exact(df, "v", "y").collect()[0]["auc"] is None


def test_log_loss_matches_direct_formula(spark):
    # p = 3/4 for all rows; half labels positive
    rows = [(1, 3, 4), (0, 3, 4), (1, 3, 4), (0, 3, 4)]
    df = spark.createDataFrame(rows, "y long, num long, den long")
    r = log_loss(df, "y", "num", "den").collect()[0]
    want = 0.5 * (-math.log(0.75)) + 0.5 * (-math.log(0.25))
    assert abs(r["ll"] - want) < 2e-3  # 2^-10 grid error


def test_lift_curve_top_bin_captures_positives(spark):
    # top 20 scores are all the positives
    rows = [(i, 100 - i, 1 if i < 20 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "i long, s long, y long")
    out = {r["bin"]: r for r in lift_curve(
        df, score="s", label="y", id_col="i", n_bins=10
    ).collect()}
    assert out[0]["pos_b"] == 10 and out[1]["pos_b"] == 10
    assert out[1]["gain"] == 1.0
    assert abs(out[0]["lift"] - 5.0) < 1e-12  # 100% vs 20% base
    assert abs(out[9]["lift"] - 1.0) < 1e-12  # full population
