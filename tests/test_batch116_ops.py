"""Invariant tests for batch 116: IoU join, interval coverage."""

from __future__ import annotations

from pdal_spark.operators.overlay import IOU_Q, iou_join
from pdal_spark.operators.temporal import interval_coverage


def _boxes(spark, rows, idc):
    return spark.createDataFrame(
        rows, f"{idc} long, x0 long, x1 long, y0 long, y1 long"
    )


def test_iou_join_exact_values(spark):
    a = _boxes(spark, [(1, 0, 10, 0, 10)], "lid")
    b = _boxes(spark, [(2, 5, 15, 0, 10), (3, 40, 50, 40, 50),
                       (4, 10, 20, 0, 10)], "rid")
    out = {r["rid"]: r for r in
           iou_join(a, b, cell=8.0).collect()}
    # box2: inter 50, union 150 -> IoU 1/3
    assert out[2]["inter"] == 50 and out[2]["union_a"] == 150
    assert out[2]["iou_q"] == (50 * IOU_Q) // 150
    # box4 touches at x=10: zero-area intersection, IoU 0 (kept
    # at min_iou_q=0)
    assert out[4]["inter"] == 0 and out[4]["iou_q"] == 0
    assert 3 not in out  # disjoint


def test_iou_join_threshold(spark):
    a = _boxes(spark, [(1, 0, 10, 0, 10)], "lid")
    b = _boxes(spark, [(2, 9, 19, 0, 10)], "rid")
    # IoU = 10/190 ~ 0.0526
    hi = iou_join(a, b, cell=8.0, min_iou_q=IOU_Q // 10).count()
    lo = iou_join(a, b, cell=8.0, min_iou_q=IOU_Q // 40).count()
    assert hi == 0 and lo == 1


def test_interval_coverage_merges_and_counts(spark):
    rows = [(1, 0, 5), (1, 3, 8), (1, 8, 9), (1, 20, 25),
            (2, 0, 1)]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    out = {r["k"]: r for r in
           interval_coverage(df, "k", "s", "e").collect()}
    # key 1: [0,9] (touching merges) and [20,25] -> covered 14
    assert out[1]["n_islands"] == 2
    assert out[1]["covered"] == 14 and out[1]["span"] == 25
    assert out[2]["n_islands"] == 1 and out[2]["covered"] == 1


def test_interval_coverage_contained_intervals(spark):
    rows = [(1, 0, 100), (1, 10, 20), (1, 30, 40)]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    r = interval_coverage(df, "k", "s", "e").collect()[0]
    assert r["n_islands"] == 1 and r["covered"] == 100
