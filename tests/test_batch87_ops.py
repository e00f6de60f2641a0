"""hough_lines / cost_path_tree / image_dhash / fill_depressions."""

from pdal_spark.operators.h3 import hough_lines
from pdal_spark.operators.multimodal import (
    attach_binary,
    image_ahash,
    image_dhash,
)
from pdal_spark.operators.raster import (
    FOCAL_Q,
    cost_path_tree,
    fill_depressions,
)
from pdal_spark.sqlgen import qcell_pack

RES = 4


def _cell(ix, iy):
    return int(eval(qcell_pack(str(ix), str(iy), RES)))


def _grid(spark, cells):
    return spark.createDataFrame(
        [(_cell(ix, iy), int(z)) for (ix, iy), z in cells.items()],
        ["cell", "x"],
    )


def test_hough_vertical_line_dominates(spark):
    # 20 points on lon=5 (a vertical line), 3 noise points: theta 0
    # (rho = x) collects all 20 votes in one bin.
    rows = [(5.0, float(i)) for i in range(20)]
    rows += [(1.0, 50.0), (9.0, 60.0), (3.0, 70.0)]
    df = spark.createDataFrame(rows, ["lon", "lat"])
    top = hough_lines(df, n_thetas=16, rho_bin_q=1 << 12,
                      coord_q=1 << 10, top_n=3).collect()
    assert top[0].votes == 20 and top[0].theta_k == 0


def test_hough_horizontal_line_hits_theta_quarter(spark):
    # lat=7 constant: theta = pi/2 (k = 8 of 16) has rho = y.
    rows = [(float(i), 7.0) for i in range(15)]
    df = spark.createDataFrame(rows, ["lon", "lat"])
    top = hough_lines(df, n_thetas=16, rho_bin_q=1 << 12,
                      coord_q=1 << 10, top_n=1).collect()
    assert top[0].votes == 15 and top[0].theta_k == 8


def test_cost_path_tree_chain_predecessors(spark):
    cells = {(ix, 0): 1 for ix in range(3)}
    src = _cell(0, 0)
    out = {r.cell: r for r in
           cost_path_tree(_grid(spark, cells), RES, source=src,
                          rounds=4).collect()}
    assert out[src].pred is None and out[src].dist == 0
    assert out[_cell(1, 0)].pred == src
    assert out[_cell(2, 0)].pred == _cell(1, 0)
    assert out[_cell(2, 0)].dist == 4 * FOCAL_Q


def test_dhash_constant_image_is_zero(spark):
    # text "a": every pixel identical -> strict < never true.
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    (r,) = image_dhash(attach_binary(df), codec="fake").collect()
    assert (r.dhash_hi, r.dhash_lo) == (0, 0)
    # aHash of the constant image: v*64 >= sum always -> all ones.
    (a,) = image_ahash(attach_binary(df), codec="fake").collect()
    assert (a.ahash_hi, a.ahash_lo) == (0xFFFFFFFF, 0xFFFFFFFF)


def test_fill_depressions_crater_fills_to_spill(spark):
    # 5x5: rim z=10 (grid boundary, pinned), inner ring z=8,
    # center pit z=2 -> fills to the inner spill level 8.
    cells = {}
    for ix in range(5):
        for iy in range(5):
            if ix in (0, 4) or iy in (0, 4):
                cells[(ix, iy)] = 10
            elif (ix, iy) == (2, 2):
                cells[(ix, iy)] = 2
            else:
                cells[(ix, iy)] = 8
    out = {r.cell: r for r in
           fill_depressions(_grid(spark, cells), RES).collect()}
    # EVERYTHING inside the rim is one depression with spill level
    # 10 (the inner ring at 8 is below the rim too).
    assert out[_cell(2, 2)].z == 2 and out[_cell(2, 2)].fill == 10
    assert out[_cell(1, 1)].fill == 10
    assert out[_cell(0, 0)].fill == 10  # rim pinned

    # Breach the rim at z=6: water now exits over the breach, so the
    # interior only fills to the inner ring's own level 8 (the pit
    # must still cross the ring), and the ring cells stay at 8.
    cells[(0, 2)] = 6
    out2 = {r.cell: r for r in
            fill_depressions(_grid(spark, cells), RES).collect()}
    assert out2[_cell(2, 2)].fill == 8
    assert out2[_cell(1, 2)].fill == 8 and out2[_cell(1, 1)].fill == 8


def test_fill_depressions_edge_pit_drains_out(spark):
    # A pit ON the sparse boundary is pinned to its own z (water
    # escapes through unobserved space) — no fill.
    cells = {(0, 0): 1, (1, 0): 9, (0, 1): 9, (1, 1): 9}
    out = {r.cell: r for r in
           fill_depressions(_grid(spark, cells), RES).collect()}
    assert out[_cell(0, 0)].fill == 1
