"""Invariant tests for batch 136: Page-Hinkley, max drawdown."""

from __future__ import annotations

from pdal_spark.operators.temporal import (
    PH_Q,
    max_drawdown,
    page_hinkley,
)


def _series(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "o long, v long"
    )


def test_page_hinkley_rises_after_shift(spark):
    vals = [10] * 30 + [30] * 10
    out = sorted(page_hinkley(_series(spark, vals), "o",
                              "v").collect(),
                 key=lambda r: r["o"])
    # before the shift PH stays ~0; after it grows
    assert out[29]["ph_q"] <= PH_Q  # tiny numeric dust at most
    assert out[-1]["ph_q"] > 50 * PH_Q


def test_page_hinkley_constant_is_zero(spark):
    out = page_hinkley(_series(spark, [7] * 20), "o",
                       "v").collect()
    assert all(r["ph_q"] == 0 for r in out)


def test_max_drawdown_hand_case(spark):
    # equity path: 5, 8, 3, 9, 2 -> peak 9, mdd = 9 - 2 = 7
    deltas = [5, 3, -5, 6, -7]
    df = spark.createDataFrame(
        [(0, i, d) for i, d in enumerate(deltas)],
        "k long, o long, v long",
    )
    r = max_drawdown(df, "k", "o", "v").collect()[0]
    assert r["peak"] == 9 and r["mdd"] == 7 and r["final"] == 2


def test_max_drawdown_monotone_rise_is_zero(spark):
    df = spark.createDataFrame(
        [(0, i, 1) for i in range(10)], "k long, o long, v long"
    )
    assert max_drawdown(df, "k", "o", "v").collect()[0]["mdd"] == 0
