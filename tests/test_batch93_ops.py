"""distance_transform / flow_path_length / basin_stats behavior."""

from pdal_spark.operators.raster import (
    basin_stats,
    distance_transform,
    flow_path_length,
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


def test_distance_transform_rings(spark):
    occ = spark.createDataFrame([(_cell(5, 5),)], ["cell"])
    out = {r.cell: r.dt for r in
           distance_transform(occ, RES, max_rounds=2).collect()}
    assert out[_cell(5, 5)] == 0
    assert out[_cell(6, 5)] == 1 and out[_cell(6, 6)] == 1
    assert out[_cell(7, 5)] == 2 and out[_cell(7, 7)] == 2
    assert _cell(8, 5) not in out  # beyond the horizon
    assert len(out) == 25  # full 5x5 envelope on-grid


def test_distance_transform_nearest_of_two(spark):
    occ = spark.createDataFrame(
        [(_cell(2, 5),), (_cell(8, 5),)], ["cell"])
    out = {r.cell: r.dt for r in
           distance_transform(occ, RES, max_rounds=3).collect()}
    assert out[_cell(4, 5)] == 2  # closer to (2,5)
    assert out[_cell(6, 5)] == 2  # closer to (8,5)


def test_flow_path_length_chain(spark):
    cells = {(ix, 0): 30 - 10 * ix for ix in range(4)}
    out = {r.cell: r for r in
           flow_path_length(_grid(spark, cells), RES).collect()}
    pit = _cell(3, 0)
    assert [out[_cell(ix, 0)].path_len for ix in range(4)] \
        == [3, 2, 1, 0]
    assert all(r.outlet == pit for r in out.values())


def test_basin_stats_rollup(spark):
    # two separated chains -> two basins with known stats
    cells = {(0, 0): 20, (1, 0): 10,
             (8, 8): 7, (9, 8): 5, (10, 8): 1}
    out = {r.basin: r for r in
           basin_stats(_grid(spark, cells), RES).collect()}
    b1, b2 = _cell(1, 0), _cell(10, 8)
    assert out[b1].n_cells == 2 and out[b1].relief == 10
    assert out[b1].z_sum == 30
    assert out[b2].n_cells == 3 and out[b2].z_min == 1
    assert out[b2].z_max == 7
