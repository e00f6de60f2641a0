"""Batch-14 ops: morans_i, snap_to_lines, zonemap_prune_stats."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import transform as ops_transform
from pdal_spark.plans import bucketing as ops_bucketing
from pdal_spark.sqlgen import qcell_pack


def _cells(spark, vals, res=4):
    # vals: {(ix, iy): x}
    rows = []
    for (ix, iy), x in vals.items():
        cell = int(eval(qcell_pack(str(ix), str(iy), res)))
        rows.append((cell, x))
    return spark.createDataFrame(rows, ["cell", "x"])


def test_morans_i_checkerboard_negative_block_positive(spark):
    # 4x4 checkerboard -> negative autocorrelation. (QUEEN adjacency
    # keeps same-color diagonals, so the value is mild: exactly -1/7
    # on this lattice, not the rook-adjacency -1.)
    vals = {(ix, iy): 10 if (ix + iy) % 2 == 0 else 0
            for ix in range(4, 8) for iy in range(4, 8)}
    r = ops_stats.morans_i(_cells(spark, vals), res=4).collect()[0]
    assert r.morans_i == pytest.approx(-1.0 / 7.0)

    # two homogeneous blocks -> positive autocorrelation
    vals2 = {(ix, iy): (10 if ix < 6 else 0)
             for ix in range(4, 8) for iy in range(4, 8)}
    r2 = ops_stats.morans_i(_cells(spark, vals2), res=4).collect()[0]
    assert r2.morans_i > 0.3


def test_snap_to_lines_picks_nearest_and_max_dist(spark):
    lines = [
        (0, [(0.0, 0.0), (10.0, 0.0)]),   # along the equator
        (1, [(0.0, 10.0), (10.0, 10.0)]),  # 10 deg north
    ]
    pts = spark.createDataFrame(
        [(1, 1.0, 5.0), (2, 9.0, 5.0), (3, 40.0, 5.0)],
        ["pid", "lat", "lon"],
    )
    out = {r.pid: r for r in
           ops_transform.snap_to_lines(pts, lines).collect()}
    assert out[1].line_id == 0 and out[1].snap_dist == 1.0
    assert out[2].line_id == 1 and out[2].snap_dist == 1.0
    assert out[3].line_id == 1 and out[3].snap_dist == 30.0
    kept = ops_transform.snap_to_lines(pts, lines, max_dist=5.0)
    assert {r.pid for r in kept.collect()} == {1, 2}


def test_zonemap_sorted_layout_prunes_shuffled_does_not(spark):
    df = spark.range(10000).selectExpr(
        "id AS event_id",
        "cast(id % 1000 as double) AS value",
        "cast((id * 48271) % 1000 as double) AS shuffled",
    )
    sorted_stats = ops_bucketing.zonemap_prune_stats(
        df, "value", "event_id", 250, 100.0, 150.0
    ).collect()[0]
    # values 0..999 x10 each; sorted: range [100,150] spans ~510 rows
    # -> ~3 of 40 groups scanned
    assert sorted_stats.n_groups == 40
    assert sorted_stats.n_scanned <= 4
    assert sorted_stats.prune_frac_q >= ((36 * (1 << 20)) // 40)
    assert (
        sorted_stats.n_rows_scanned
        >= 510  # every matching row is inside a scanned group
    )
