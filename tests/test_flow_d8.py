"""D8 flow_direction / flow_accumulation behavior on known grids."""

from pdal_spark.operators.raster import flow_accumulation, flow_direction
from pdal_spark.sqlgen import qcell_pack

RES = 4


def _cell(ix, iy):
    return int(eval(qcell_pack(str(ix), str(iy), RES)))


def _grid(spark, cells):
    return spark.createDataFrame(
        [(_cell(ix, iy), int(z)) for (ix, iy), z in cells.items()],
        ["cell", "x"],
    )


def test_uniform_slope_drains_east(spark):
    # z decreases with ix: every interior cell drains E (code 1) —
    # the cardinal drop (d) beats the diagonal drop (d / sqrt 2).
    cells = {(ix, iy): 100 - 10 * ix for ix in range(4) for iy in range(4)}
    fd = {r.cell: r for r in
          flow_direction(_grid(spark, cells), RES).collect()}
    for ix in range(3):
        for iy in range(4):
            r = fd[_cell(ix, iy)]
            assert r.d8 == 1 and r.down_cell == _cell(ix + 1, iy)
            assert r.zdrop == 10
    # ix=3 column: the antimeridian wraps ix 3 -> 4..15 unobserved,
    # and wrap-around to ix=0 is UPHILL, so the rim is a pit.
    for iy in range(4):
        r = fd[_cell(3, iy)]
        assert r.d8 == 0 and r.down_cell == _cell(3, iy) and r.zdrop == 0


def test_diagonal_beats_weak_cardinal(spark):
    # centre at z=10; E neighbor z=9 (drop 1), SE neighbor z=8
    # (drop 2): 2/sqrt2 > 1 so SE (code 2) wins.
    cells = {(1, 1): 10, (2, 1): 9, (2, 0): 8}
    fd = {r.cell: r for r in
          flow_direction(_grid(spark, cells), RES).collect()}
    r = fd[_cell(1, 1)]
    assert r.d8 == 2 and r.down_cell == _cell(2, 0) and r.zdrop == 2


def test_tie_breaks_to_smallest_code(spark):
    # E and S both drop 5: code 1 (E) < 4 (S) wins.
    cells = {(1, 1): 10, (2, 1): 5, (1, 0): 5}
    fd = {r.cell: r for r in
          flow_direction(_grid(spark, cells), RES).collect()}
    assert fd[_cell(1, 1)].d8 == 1


def test_accumulation_counts_upstream_cells(spark):
    # A chain 30 -> 20 -> 10 -> 0 along ix: acc = 0, 1, 2, 3.
    cells = {(ix, 0): 30 - 10 * ix for ix in range(4)}
    acc = {r.cell: r.acc for r in
           flow_accumulation(_grid(spark, cells), RES).collect()}
    assert [acc[_cell(ix, 0)] for ix in range(4)] == [0, 1, 2, 3]


def test_accumulation_merging_branches(spark):
    # T shape: north and south branches merge at (1,1), then drain
    # east. Outlet z=8 keeps the branch diagonals (drop 12 * Q)
    # weaker than the cardinal merges (drop 10 * sqrt2 * Q).
    cells = {(1, 2): 20, (1, 0): 20, (1, 1): 10, (2, 1): 8}
    acc = {r.cell: r.acc for r in
           flow_accumulation(_grid(spark, cells), RES).collect()}
    assert acc[_cell(1, 2)] == 0 and acc[_cell(1, 0)] == 0
    assert acc[_cell(1, 1)] == 2
    assert acc[_cell(2, 1)] == 3
