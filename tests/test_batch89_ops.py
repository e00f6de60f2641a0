"""chaikin_smooth / polygon_centroid / focal_weighted /
gravity_residuals behavior."""

from pdal_spark.operators.features import polygon_centroid
from pdal_spark.operators.h3 import GRAV_Q, gravity_residuals
from pdal_spark.operators.raster import FOCAL_Q, focal_weighted
from pdal_spark.operators.transform import chaikin_smooth
from pdal_spark.sqlgen import qcell_pack


def test_chaikin_right_angle_is_cut(spark):
    # L-shaped track (0,0) (10,0) (10,10) with coord_q=1:
    # after one round the corner (10,0) is GONE, replaced by the
    # quarter points; endpoints survive verbatim.
    rows = [(1, 0, 0.0, 0.0), (1, 1, 10.0, 0.0), (1, 2, 10.0, 10.0)]
    df = spark.createDataFrame(rows, ["k", "o", "lat", "lon"])
    out = sorted(chaikin_smooth(df, rounds=1, key_col="k",
                                order_col="o", coord_q=1).collect(),
                 key=lambda r: r.seq)
    pts = [(r.xq, r.yq) for r in out]
    # scale 4: coords x4. corner was (0,40) in (x=lon,y=lat)*4...
    # lon is x: track x: 0,0,40 ; y: 0,40,40 (scaled by 4)
    assert pts[0] == (0, 0) and pts[-1] == (40, 40)
    assert (0, 40) not in pts  # the corner is cut
    assert len(pts) == 2 + 4  # 2 endpoints + 2 per edge


def test_chaikin_collinear_points_stay_on_line(spark):
    rows = [(1, i, 0.0, float(4 * i)) for i in range(4)]
    df = spark.createDataFrame(rows, ["k", "o", "lat", "lon"])
    out = chaikin_smooth(df, rounds=2, key_col="k", order_col="o",
                         coord_q=1).collect()
    assert all(r.yq == 0 for r in out)  # lat stays 0
    xs = sorted(r.xq for r in out)
    assert xs == sorted(set(xs))  # strictly increasing, no dups


def test_polygon_centroid_unit_square(spark):
    # CCW square (0,0)(10,0)(10,10)(0,10): area 100 (a2=200),
    # centroid (5, 5).
    verts = [(1, 0, 0, 0), (1, 1, 10, 0), (1, 2, 10, 10),
             (1, 3, 0, 10)]
    df = spark.createDataFrame(verts, ["poly_id", "seq", "xq", "yq"])
    (r,) = polygon_centroid(df).collect()
    assert r.a2 == 200 and (r.cx, r.cy) == (5.0, 5.0)


def test_polygon_centroid_cw_has_negative_area(spark):
    verts = [(1, 0, 0, 0), (1, 1, 0, 10), (1, 2, 10, 10),
             (1, 3, 10, 0)]
    df = spark.createDataFrame(verts, ["poly_id", "seq", "xq", "yq"])
    (r,) = polygon_centroid(df).collect()
    assert r.a2 == -200 and (r.cx, r.cy) == (5.0, 5.0)


def test_focal_weighted_uniform_field(spark):
    # all cells = 7: wmean_q = 7 * FOCAL_Q regardless of weights.
    cells = [(int(eval(qcell_pack(str(ix), str(iy), 4))), 7)
             for ix in range(5) for iy in range(5)]
    df = spark.createDataFrame(cells, ["cell", "x"])
    out = focal_weighted(df, res=4, weights=(4, 2, 1)).collect()
    assert all(r.wmean_q == 7 * FOCAL_Q for r in out)
    center = int(eval(qcell_pack("2", "2", 4)))
    r = {x.cell: x for x in out}[center]
    # full 5x5 disk: 1*4 + 8*2 + 16*1 = 36 weight total
    assert r.n_terms == 25 and r.wtot == 36


def test_gravity_residuals_inverse_square(spark):
    # two users o->d identical: one flow with n=2; self totals.
    rows = [(1, 0, 0.0, 0.0), (1, 1, 0.0, 40.0),
            (2, 0, 0.0, 0.0), (2, 1, 0.0, 40.0)]
    df = spark.createDataFrame(rows, ["k", "o", "lat", "lon"])
    out = gravity_residuals(df, key="k", order="o", res=4).collect()
    (r,) = out
    assert r.n_trips == 2 and r.o_tot == 2 and r.d_tot == 2
    # 40 degrees lon at res 4 = |dx| cells; d2 > 0, expect_q exact
    assert r.d2 > 0
    assert r.expect_q == (2 * 2 * GRAV_Q) // r.d2
