"""Invariant tests for batch 191: debounce audit, gap stats."""

from __future__ import annotations

from pdal_spark.operators.temporal import debounce_audit, gap_stats


def test_debounce_counts(spark):
    rows = [(0, t) for t in (0, 1, 10, 11, 12, 30)]
    df = spark.createDataFrame(rows, "k long, o long")
    r = debounce_audit(df, "k", "o", delta=2).collect()[0]
    # gaps: 1, 9, 1, 1, 18 -> 3 bounces
    assert r["n_bounce"] == 3 and r["min_gap"] == 1
    assert abs(r["bounce_share"] - 3 / 5) < 1e-12


def test_gap_stats_order_statistics(spark):
    rows = [(0, t) for t in (0, 2, 5, 9, 14, 20)]
    # gaps: 2, 3, 4, 5, 6 -> med 4, q1 at rank 2 = 3, q3 rank 6?
    df = spark.createDataFrame(rows, "k long, o long")
    r = gap_stats(df, "k", "o").collect()[0]
    assert r["n_gaps"] == 5
    assert r["gap_med2"] == 8       # doubled median 4
    assert r["q1"] == 3
    assert r["q3"] == 5 and r["iqr"] == 2
