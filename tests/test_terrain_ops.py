"""watershed_label / terrain_indices / viewshed_transect behavior."""

from pdal_spark.operators.raster import (
    FOCAL_Q,
    terrain_indices,
    viewshed_transect,
    watershed_label,
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


def test_watershed_single_chain(spark):
    # 30 -> 20 -> 10 -> 0 along ix: one basin at the pit (3,0).
    cells = {(ix, 0): 30 - 10 * ix for ix in range(4)}
    lab = {r.cell: r.basin for r in
           watershed_label(_grid(spark, cells), RES).collect()}
    assert set(lab.values()) == {_cell(3, 0)}
    assert len(lab) == 4


def test_watershed_two_basins(spark):
    # Ridge at ix=2 drains both ways; ridge cell itself goes to the
    # DEEPER side (E drop 21 > W drop 20): basins split 2 / 3.
    cells = {(0, 0): 0, (1, 0): 10, (2, 0): 20,
             (3, 0): 5, (4, 0): -1}
    lab = {r.cell: r.basin for r in
           watershed_label(_grid(spark, cells), RES).collect()}
    west, east = _cell(0, 0), _cell(4, 0)
    assert lab[_cell(0, 0)] == west and lab[_cell(1, 0)] == west
    assert lab[_cell(2, 0)] == east  # steeper side wins
    assert lab[_cell(3, 0)] == east and lab[_cell(4, 0)] == east


def test_terrain_indices_flat(spark):
    cells = {(ix, iy): 7 for ix in range(3) for iy in range(3)}
    rows = {r.cell: r for r in
            terrain_indices(_grid(spark, cells), RES).collect()}
    c = rows[_cell(1, 1)]
    assert c.n_nbrs == 8 and c.tpi_q == 0 and c.tri_ssq == 0
    assert c.rough == 0


def test_terrain_indices_peak(spark):
    # Center 10, all 8 neighbors 2: tpi = (10-2)*Q, tri_ssq = 8*64,
    # rough = 8.
    cells = {(ix, iy): 2 for ix in range(3) for iy in range(3)}
    cells[(1, 1)] = 10
    rows = {r.cell: r for r in
            terrain_indices(_grid(spark, cells), RES).collect()}
    c = rows[_cell(1, 1)]
    assert c.tpi_q == 8 * FOCAL_Q
    assert c.tri_ssq == 8 * 64 and c.rough == 8
    # A corner neighbor sees the peak: rough = 8 too.
    assert rows[_cell(0, 0)].rough == 8


def test_viewshed_blocker_hides_lower_cells(spark):
    # East ray from origin (8,8), z0=10. d=1: z=10 (slope 0,
    # visible). d=2: z=50 (high blocker, visible). d=3: z=10
    # (below the blocker sight-line, HIDDEN). d=4: z=100 (clears
    # it, visible).
    cells = {(8, 8): 10, (9, 8): 10, (10, 8): 50,
             (11, 8): 10, (12, 8): 100}
    out = {r.d: r for r in viewshed_transect(
        _grid(spark, cells), RES, origin=_cell(8, 8)).collect()}
    assert len(out) == 4 and all(r.ray == 1 for r in out.values())
    assert out[1].visible and out[2].visible
    assert not out[3].visible
    assert out[4].visible


def test_viewshed_only_ray_cells_emitted(spark):
    # A knight-move cell (off every ray) must not appear.
    cells = {(8, 8): 5, (9, 8): 4, (10, 9): 4, (9, 9): 3}
    out = viewshed_transect(_grid(spark, cells), RES,
                            origin=_cell(8, 8)).collect()
    got = {r.cell for r in out}
    assert _cell(10, 9) not in got
    assert got == {_cell(9, 8), _cell(9, 9)}
    # NE diagonal (9,9): ray code 128.
    rays = {r.cell: r.ray for r in out}
    assert rays[_cell(9, 9)] == 128 and rays[_cell(9, 8)] == 1
