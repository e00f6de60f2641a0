"""resolve_flats / channel_network behavior."""

from pdal_spark.operators.raster import channel_network, resolve_flats
from pdal_spark.sqlgen import qcell_pack

RES = 4


def _cell(ix, iy):
    return int(eval(qcell_pack(str(ix), str(iy), RES)))


def _grid(spark, cells):
    return spark.createDataFrame(
        [(_cell(ix, iy), int(z)) for (ix, iy), z in cells.items()],
        ["cell", "x"],
    )


def test_resolve_flats_drains_toward_exit(spark):
    # A 3-cell flat at z=10 whose east end touches a z=0 exit:
    # (0,0)=10 (1,0)=10 (2,0)=10 (3,0)=0.
    # (2,0) drains east already; flats (0,0),(1,0) must drain east
    # toward the exit (bd: (1,0)=1 hop from exit cell (2,0)).
    cells = {(0, 0): 10, (1, 0): 10, (2, 0): 10, (3, 0): 0}
    out = {r.cell: r for r in
           resolve_flats(_grid(spark, cells), RES).collect()}
    assert out[_cell(2, 0)].d8 == 1  # original drainage kept
    assert out[_cell(1, 0)].d8 == 1
    assert out[_cell(1, 0)].down_cell == _cell(2, 0)
    assert out[_cell(0, 0)].d8 == 1
    assert out[_cell(0, 0)].down_cell == _cell(1, 0)


def test_resolve_flats_true_pit_keeps_self_loop(spark):
    # Isolated minimum with no equal neighbor: stays a self-loop.
    cells = {(1, 1): 0, (0, 1): 5, (2, 1): 5}
    out = {r.cell: r for r in
           resolve_flats(_grid(spark, cells), RES).collect()}
    assert out[_cell(1, 1)].d8 == 0
    assert out[_cell(1, 1)].down_cell == _cell(1, 1)


def test_resolve_flats_unreachable_flat_keeps_self_loop(spark):
    # Two equal cells with NO draining exit anywhere: both keep the
    # self-loop (no bd row joins).
    cells = {(0, 0): 7, (1, 0): 7}
    out = {r.cell: r for r in
           resolve_flats(_grid(spark, cells), RES).collect()}
    assert all(r.d8 == 0 for r in out.values())


def test_channel_network_thresholds_edges(spark):
    # Chain 40 -> 30 -> 20 -> 10 -> 0: acc = 0,1,2,3,4. With
    # threshold 2 the channel = edges from cells with acc >= 2.
    cells = {(ix, 0): 40 - 10 * ix for ix in range(5)}
    out = {(r.cell, r.down_cell): r.acc for r in
           channel_network(_grid(spark, cells), RES,
                           acc_threshold=2).collect()}
    assert set(out) == {(_cell(2, 0), _cell(3, 0)),
                        (_cell(3, 0), _cell(4, 0))}
    assert out[(_cell(2, 0), _cell(3, 0))] == 2
