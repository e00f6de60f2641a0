"""Invariant tests for batch 117: NMS, greedy set cover."""

from __future__ import annotations

from pdal_spark.operators.overlay import IOU_Q, nms_boxes
from pdal_spark.operators.sampling import greedy_set_cover


def test_nms_suppresses_overlap_keeps_disjoint(spark):
    rows = [
        (1, 90, 0, 10, 0, 10),    # best box
        (2, 80, 1, 11, 0, 10),    # heavy overlap with 1 -> dropped
        (3, 70, 50, 60, 50, 60),  # disjoint -> kept
        (4, 60, 51, 61, 50, 60),  # overlaps 3 -> dropped
    ]
    df = spark.createDataFrame(
        rows, "bid long, score long, x0 long, x1 long, y0 long,"
        " y1 long"
    )
    out = nms_boxes(df, k=4, iou_thresh_q=IOU_Q // 5).collect()
    picks = [(r["bid"], r["sel_rank"]) for r in
             sorted(out, key=lambda r: r["sel_rank"])]
    assert picks == [(1, 1), (3, 2)]


def test_nms_tie_breaks_to_smaller_id(spark):
    rows = [(5, 90, 0, 10, 0, 10), (2, 90, 100, 110, 0, 10)]
    df = spark.createDataFrame(
        rows, "bid long, score long, x0 long, x1 long, y0 long,"
        " y1 long"
    )
    out = sorted(nms_boxes(df, k=2).collect(),
                 key=lambda r: r["sel_rank"])
    assert out[0]["bid"] == 2 and out[1]["bid"] == 5


def test_greedy_set_cover_order_and_gains(spark):
    # set 1 covers {1..5}; set 2 covers {4..9}; set 3 covers {1,2}
    rows = [(1, e) for e in range(1, 6)] \
        + [(2, e) for e in range(4, 10)] \
        + [(3, e) for e in (1, 2)]
    df = spark.createDataFrame(rows, "s long, e long")
    out = sorted(greedy_set_cover(df, k=3, set_col="s",
                                  elem_col="e").collect(),
                 key=lambda r: r["sel_rank"])
    # round 1: set 2 (gain 6); round 2: set 1 adds {1,2,3} (3);
    # round 3: set 3 adds nothing -> stops
    assert [(r["sid"], r["gain"]) for r in out] == [(2, 6), (1, 3)]
