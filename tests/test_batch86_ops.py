"""local_morans_i / ripleys_k / semivariogram / holt_linear /
strahler_order behavior."""

from pdal_spark.operators.raster import strahler_order
from pdal_spark.operators.stats import (
    local_morans_i,
    ripleys_k,
    semivariogram,
)
from pdal_spark.operators.temporal import HOLT_SCALE, holt_linear
from pdal_spark.sqlgen import qcell_pack

RES = 4


def _cell(ix, iy):
    return int(eval(qcell_pack(str(ix), str(iy), RES)))


def _grid(spark, cells):
    return spark.createDataFrame(
        [(_cell(ix, iy), int(z)) for (ix, iy), z in cells.items()],
        ["cell", "x"],
    )


def test_local_morans_high_high_cluster_positive(spark):
    # 4x4 field: left half all 10, right half all 0 — interior
    # same-value neighborhoods give positive lisa; the two middle
    # columns (mixed neighborhoods) are lower.
    cells = {(ix, iy): (10 if ix < 2 else 0)
             for ix in range(4) for iy in range(4)}
    rows = {r.cell: r for r in
            local_morans_i(_grid(spark, cells), RES).collect()}
    assert rows[_cell(0, 0)].lisa > 0      # low-x corner: high-high
    assert rows[_cell(3, 3)].lisa > 0      # far corner: low-low
    # boundary cell has mixed neighbors -> smaller lisa than corner
    assert rows[_cell(1, 1)].lisa < rows[_cell(0, 0)].lisa


def test_ripleys_k_counts_cumulative(spark):
    # three collinear points 1 apart (coord_q=1): pairs at d=1,1,2.
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 1.0, 0.0), (3, 2.0, 0.0)],
        ["pid", "lon", "lat"],
    )
    out = {r.r_q: r.n_pairs for r in
           ripleys_k(df, radii_q=[1, 2], id_col="pid",
                     coord_q=1).collect()}
    assert out == {1: 2, 2: 3}


def test_semivariogram_bins_and_gamma(spark):
    # points at x=0,1,2 with z=0,10,20 (coord_q=value_q=1):
    # bin 1 (d in [1,2)): pairs (0,1),(1,2) dz2=100 each;
    # bin 2 (d in [2,3)): pair (0,2) dz2=400.
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 0.0), (2, 1.0, 0.0, 10.0),
         (3, 2.0, 0.0, 20.0)],
        ["pid", "lon", "lat", "z"],
    )
    out = {r.bin: (r.n_pairs, r.sum_sq_dz) for r in
           semivariogram(df, value="z", id_col="pid", bin_q=1,
                         n_bins=4, coord_q=1, value_q=1).collect()}
    assert out[1] == (2, 200) and out[2] == (1, 400)
    assert 0 not in out  # no zero-distance pairs here


def test_holt_linear_tracks_linear_trend_exactly(spark):
    # x_t = 5t: after the exact seed (l0=0, b0=5*SCALE), level and
    # trend stay locked on the line and every forecast is exact.
    rows = [(1, t, 5 * t) for t in range(10)]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    out = sorted(holt_linear(df, "k", "o", "v").collect(),
                 key=lambda r: r.o)
    assert out[0].forecast_q is None
    for r in out[1:]:
        assert r.forecast_q == 5 * r.o * HOLT_SCALE
        assert r.level_q == 5 * r.o * HOLT_SCALE
        assert r.trend_q == 5 * HOLT_SCALE


def test_strahler_textbook_merge(spark):
    # Two order-1 headwaters merging -> order 2; a third tributary
    # of order 1 joining the order-2 trunk keeps it order 2.
    #   (0,2)=30  (2,2)=30   drain S/SW+SE? build explicit chain:
    #   (0,2)->(1,1), (2,2)->(1,1)  [two order-1s merge at (1,1)]
    #   (1,1)->(1,0); (0,0)? tributary (3,1)? keep simple 4 cells.
    cells = {(0, 2): 30, (2, 2): 30, (1, 1): 20, (1, 0): 0}
    out = {r.cell: r["order"] for r in
           strahler_order(_grid(spark, cells), RES).collect()}
    assert out[_cell(0, 2)] == 1 and out[_cell(2, 2)] == 1
    assert out[_cell(1, 1)] == 2
    assert out[_cell(1, 0)] == 2  # single child at 2 stays 2


def test_strahler_single_chain_stays_order_one(spark):
    cells = {(ix, 0): 30 - 10 * ix for ix in range(4)}
    out = {r.cell: r["order"] for r in
           strahler_order(_grid(spark, cells), RES).collect()}
    assert set(out.values()) == {1}
