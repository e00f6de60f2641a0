"""Invariant tests for batch 99: marching-squares contours,
spherical polygon area, Burrows' Delta."""

from __future__ import annotations

import math

from pdal_spark.operators.features import spherical_polygon_area
from pdal_spark.operators.raster import contour_segments
from pdal_spark.operators.textops import burrows_delta


def test_contour_single_peak_closed_ring(spark):
    # one node above level in an empty field: the contour is a
    # closed diamond through the 4 squares touching the node —
    # exactly the 4 single-corner cases
    cells = spark.createDataFrame(
        [(5, 5, 10)], "ix long, iy long, c long"
    )
    segs = contour_segments(cells, level=5).collect()
    assert len(segs) == 4
    assert sorted(r["ms_idx"] for r in segs) == [1, 2, 4, 8]
    # z goes 0 -> 10 across each edge, level 5 -> midpoint crossing
    q = 1 << 20
    for r in segs:
        for c in ["x1a", "y1a", "x1b", "y1b"]:
            assert r[c] % (q // 2) == 0
        assert r["x2a"] is None


def test_contour_plateau_no_interior_segments(spark):
    # a 3x3 plateau at z=9: interior squares are case 15 (dropped),
    # only the boundary ring emits segments
    cells = spark.createDataFrame(
        [(i, j, 9) for i in range(3) for j in range(3)],
        "ix long, iy long, c long",
    )
    segs = contour_segments(cells, level=5).collect()
    assert all(1 <= r["ms_idx"] <= 14 for r in segs)
    assert not any(
        (r["sx"], r["sy"]) == (0, 0) and r["ms_idx"] == 15
        for r in segs
    )
    assert len(segs) == 12  # 3x3 node block -> 4x4 squares - 4 full


def test_spherical_area_one_degree_square(spark):
    verts = spark.createDataFrame(
        [(1, 0, 0.0, 0.0), (1, 1, 1.0, 0.0),
         (1, 2, 1.0, 1.0), (1, 3, 0.0, 1.0)],
        "poly_id long, seq long, lon double, lat double",
    )
    row = spherical_polygon_area(verts).collect()[0]
    r = 6371.0088
    expected = r * r * math.radians(1.0) * math.sin(math.radians(1.0))
    assert row["n_verts"] == 4
    assert abs(row["area_km2"] - expected) < 1.0


def test_spherical_area_antimeridian_wrap(spark):
    # same square straddling the antimeridian: identical area
    verts = spark.createDataFrame(
        [(1, 0, 179.5, 0.0), (1, 1, -179.5, 0.0),
         (1, 2, -179.5, 1.0), (1, 3, 179.5, 1.0)],
        "poly_id long, seq long, lon double, lat double",
    )
    row = spherical_polygon_area(verts).collect()[0]
    r = 6371.0088
    expected = r * r * math.radians(1.0) * math.sin(math.radians(1.0))
    assert abs(row["area_km2"] - expected) < 1.0


def test_burrows_delta_twins_vs_outlier(spark):
    a = "the cat and the dog and the bird went to the house"
    b = a  # identical style
    c = "zebras quokka xylophone quartz jjjj kkkk llll mmmm nnnn oooo"
    docs = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string"
    )
    out = {(r["doc_a"], r["doc_b"]): r["delta_q"] for r in
           burrows_delta(docs, top_m=10, block_mod=1).collect()}
    assert out[(0, 1)] == 0           # identical docs: zero delta
    assert out.get((0, 2), 10**9) > 0  # style outlier: positive


def test_gates_smoke_sf0001(spark):
    from pdal_spark.gate import GATES

    for name in ["contour_segments", "spherical_area",
                 "burrows_delta"]:
        df = GATES[name].spark_fn(spark, "/root/testdata/sf0.001")
        assert df.count() > 0, name
