"""Invariant tests for batch 147: trapezoid AUC, POT events."""

from __future__ import annotations

from pdal_spark.operators.temporal import pot_events, trapezoid_auc


def test_trapezoid_auc_hand_case(spark):
    # (0,0) (2,10) (3,10): areas 10 + 10 = 20
    rows = [(0, 0, 0), (0, 2, 10), (0, 3, 10)]
    df = spark.createDataFrame(rows, "k long, o long, v long")
    r = trapezoid_auc(df, "k", "o", "v").collect()[0]
    assert r["auc2"] == 40 and r["auc"] == 20.0
    assert r["span"] == 3


def test_pot_events_declusters(spark):
    vals = [1, 9, 9, 1, 1, 9, 1, 9, 9, 9]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "o long, v long"
    )
    out = sorted(pot_events(df, "o", "v", threshold=5).collect(),
                 key=lambda r: r["event_id"])
    assert len(out) == 3
    assert [(r["duration"], r["volume"]) for r in out] == [
        (2, 8), (1, 4), (3, 12)
    ]
    assert out[0]["start_o"] == 1 and out[0]["end_o"] == 2
    assert all(r["peak"] == 9 for r in out)
