"""Invariant tests for batch 133: Cox-Stuart, turning points."""

from __future__ import annotations

from pdal_spark.operators.temporal import cox_stuart, turning_points


def _series(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "o long, v long"
    )


def test_cox_stuart_monotone_trend(spark):
    r = cox_stuart(_series(spark, list(range(21))), "o",
                   "v").collect()[0]
    # n=21 odd: 10 pairs, all rising; middle element dropped
    assert r["m_pairs"] == 10 and r["s_plus"] == 10
    assert r["z"] > 3


def test_cox_stuart_flat_is_tieless_zero(spark):
    r = cox_stuart(_series(spark, [5] * 12), "o", "v").collect()[0]
    assert r["m_pairs"] == 0 and r["z"] is None


def test_cox_stuart_even_pairing(spark):
    # n=6: pairs (1,4),(2,5),(3,6) with offset 3
    r = cox_stuart(_series(spark, [1, 2, 3, 0, 0, 0]), "o",
                   "v").collect()[0]
    assert r["m_pairs"] == 3 and r["s_minus"] == 3


def test_turning_points_counts(spark):
    # zigzag: every interior point is a turn
    vals = [0, 5, 0, 5, 0, 5, 0]
    r = turning_points(_series(spark, vals), "o", "v").collect()[0]
    assert r["n_turns"] == 5
    # monotone: none
    r2 = turning_points(_series(spark, list(range(10))), "o",
                        "v").collect()[0]
    assert r2["n_turns"] == 0 and r2["z"] < -2
