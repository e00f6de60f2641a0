"""Batch-36 ops: DDA line rasterization, line density, head/tail
breaks."""

from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import stats as ops_stats


def _segs(spark, rows):
    return spark.createDataFrame(
        rows, ["seg_id", "x1", "y1", "x2", "y2"]
    )

# ---------------------------------------------------------------------------
# dda_cells
# ---------------------------------------------------------------------------


def test_dda_horizontal_line(spark):
    out = ops_raster.dda_cells(_segs(spark, [(1, 0, 5, 3, 5)]))
    cells = sorted((r.cx, r.cy) for r in out.collect())
    assert cells == [(0, 5), (1, 5), (2, 5), (3, 5)]


def test_dda_perfect_diagonal(spark):
    out = ops_raster.dda_cells(_segs(spark, [(1, 0, 0, 3, 3)]))
    cells = sorted((r.cx, r.cy) for r in out.collect())
    assert cells == [(0, 0), (1, 1), (2, 2), (3, 3)]


def test_dda_zero_length_segment(spark):
    out = ops_raster.dda_cells(_segs(spark, [(1, 7, 9, 7, 9)]))
    rows = out.collect()
    assert len(rows) == 1 and (rows[0].cx, rows[0].cy) == (7, 9)


def test_dda_negative_direction_endpoints_and_adjacency(spark):
    # reversal is NOT cell-identical (round-half-up breaks exact
    # half-steps the other way — standard DDA behavior), but both
    # directions hit the endpoints and stay within 1 of the line
    rev = ops_raster.dda_cells(_segs(spark, [(1, 4, 2, 0, 0)]))
    cells = sorted((r.cx, r.cy) for r in rev.collect())
    assert cells[0] == (0, 0) and cells[-1] == (4, 2)
    for cx, cy in cells:
        assert abs(cy - cx / 2.0) <= 1.0


def test_dda_stays_adjacent_to_ideal_line(spark):
    # every visited cell is within 1 of the exact line y = x/3
    out = ops_raster.dda_cells(_segs(spark, [(1, 0, 0, 9, 3)]))
    for r in out.collect():
        assert abs(r.cy - r.cx / 3.0) <= 1.0


# ---------------------------------------------------------------------------
# line_density
# ---------------------------------------------------------------------------


def test_line_density_crossing_segments(spark):
    segs = _segs(spark, [(1, 0, 1, 2, 1), (2, 1, 0, 1, 2)])
    out = {(r.cx, r.cy): r for r in
           ops_raster.line_density(segs).collect()}
    assert out[(1, 1)].n_segments == 2
    assert out[(0, 1)].n_segments == 1


# ---------------------------------------------------------------------------
# head_tail_breaks
# ---------------------------------------------------------------------------


def test_head_tail_breaks_heavy_tail(spark):
    # 90 ones + 10 hundreds: level0 mean ~ 10.9 -> head = the 10
    # hundreds (10% < 40% -> continue); level1 all equal -> head
    # empty -> stop after recording level1
    vals = [1] * 90 + [100] * 10
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    out = sorted(ops_stats.head_tail_breaks(df).collect(),
                 key=lambda r: r.level)
    assert out[0].level == 0 and out[0].n == 100
    assert out[0].n_head == 10
    assert out[0].mean_q == (1090 * ops_stats.HTB_Q) // 100
    assert out[1].level == 1 and out[1].n == 10
    assert out[1].n_head == 0
    assert len(out) == 2


def test_head_tail_breaks_uniform_stops_at_level0(spark):
    # head of 1..10 above mean 5.5 is 50% > 40% -> one level only
    df = spark.createDataFrame([(v,) for v in range(1, 11)], ["x"])
    out = ops_stats.head_tail_breaks(df).collect()
    assert len(out) == 1 and out[0].level == 0


def test_head_tail_breaks_singleton_empty(spark):
    df = spark.createDataFrame([(5,)], ["x"])
    assert ops_stats.head_tail_breaks(df).count() == 0
