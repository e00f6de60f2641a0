"""Vector overlay + planning + streaming batch: exact segment
intersection join, water-filling fair budget, watermarked
stream-stream attribution join."""

import datetime as dt

import pandas as pd

from pdal_spark.operators.textops import fair_budget
from pdal_spark.operators.transform import segment_intersection_join


def _segs(spark, rows, idc):
    return spark.createDataFrame(
        rows, f"{idc} long, x1 long, y1 long, x2 long, y2 long"
    )


def test_segment_intersection_cases(spark):
    a = _segs(spark, [
        (1, 0, 0, 10, 10),     # crosses b20 properly
        (2, 0, 5, 4, 5),       # disjoint from everything
        (3, 20, 20, 30, 20),   # b23 touches its endpoint
        (4, 40, 0, 50, 0),     # collinear overlap with b24
        (5, 60, 0, 70, 10),    # parallel near-miss with b25
    ], "a_id")
    b = _segs(spark, [
        (20, 0, 10, 10, 0),
        (23, 30, 20, 35, 25),  # shares endpoint (30,20)
        (24, 45, 0, 55, 0),    # overlaps a4 on [45,50]
        (25, 61, 0, 71, 10),   # parallel, shifted by 1
    ], "b_id")
    got = sorted(
        (r.a_id, r.b_id)
        for r in segment_intersection_join(a, b, cell=8).collect()
    )
    assert got == [(1, 20), (3, 23), (4, 24)]


def test_segment_intersection_no_duplicate_pairs(spark):
    # a long segment spanning many cells crossing another long one:
    # responsibility assignment must emit the pair exactly once
    a = _segs(spark, [(1, 0, 0, 100, 100)], "a_id")
    b = _segs(spark, [(2, 0, 100, 100, 0)], "b_id")
    rows = segment_intersection_join(a, b, cell=8).collect()
    assert [(r.a_id, r.b_id) for r in rows] == [(1, 2)]


def test_fair_budget_waterfilling(spark):
    dem = spark.createDataFrame(
        [("a", 2), ("b", 4), ("c", 10), ("d", 20)],
        "host string, demand long",
    )
    out = {r.host: r.alloc
           for r in fair_budget(dem, budget=20).collect()}
    # 2 and 4 fully satisfied; 14 left split 7/7
    assert out == {"a": 2, "b": 4, "c": 7, "d": 7}
    # remainder distribution: B=21 -> base 7, rem 1 -> first
    # unsatisfied rank gets +1
    out = {r.host: r.alloc
           for r in fair_budget(dem, budget=21).collect()}
    assert out == {"a": 2, "b": 4, "c": 8, "d": 7}
    assert sum(out.values()) == 21
    # everyone satisfied
    out = {r.host: r.alloc
           for r in fair_budget(dem, budget=100).collect()}
    assert out == {"a": 2, "b": 4, "c": 10, "d": 20}
    # zero budget
    out = {r.host: r.alloc
           for r in fair_budget(dem, budget=0).collect()}
    assert out == {"a": 0, "b": 0, "c": 0, "d": 0}


def test_attribution_join_within_window_and_across_runs(
    spark, tmp_path
):
    from pdal_spark.streaming.joins import run_attribution

    t0 = dt.datetime(2026, 1, 1, 12, 0)

    def t(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    imp_dir = tmp_path / "imps"; imp_dir.mkdir()
    clk_dir = tmp_path / "clks"; clk_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # run 1: impressions for users 5 and 6; one in-window click
    spark.createDataFrame(
        [(1, 5, t(0)), (2, 6, t(0))],
        "imp_id long, user_id long, imp_ts timestamp",
    ).write.parquet(str(imp_dir / "w0.parquet"))
    spark.createDataFrame(
        [(100, 5, t(5))],
        "click_id long, user_id long, clk_ts timestamp",
    ).write.parquet(str(clk_dir / "w0.parquet"))
    run_attribution(spark, f"{imp_dir}/*", f"{clk_dir}/*", ckpt,
                    out, within="10 minutes")
    got = {(int(r.imp_id), int(r.click_id))
           for r in pd.read_parquet(out).itertuples()}
    assert got == {(1, 100)}

    # run 2: user 6's click arrives in a LATER run but within the
    # window (impression state recovered from the checkpoint);
    # user 5's second click is outside the 10-minute window
    spark.createDataFrame(
        [(101, 6, t(9)), (102, 5, t(60))],
        "click_id long, user_id long, clk_ts timestamp",
    ).write.parquet(str(clk_dir / "w1.parquet"))
    run_attribution(spark, f"{imp_dir}/*", f"{clk_dir}/*", ckpt,
                    out, within="10 minutes")
    got = {(int(r.imp_id), int(r.click_id))
           for r in pd.read_parquet(out).itertuples()}
    assert got == {(1, 100), (2, 101)}
    # lag is exact microseconds
    df = pd.read_parquet(out)
    lags = {int(r.click_id): int(r.lag_us) for r in df.itertuples()}
    assert lags[100] == 5 * 60 * 1_000_000
    assert lags[101] == 9 * 60 * 1_000_000
