"""Invariant tests for batch 99: spherical polygon area and
Burrows' Delta."""

from __future__ import annotations

import math

from pdal_spark.operators.features import spherical_polygon_area
from pdal_spark.operators.textops import burrows_delta


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

    for name in ["spherical_area", "burrows_delta"]:
        df = GATES[name].spark_fn(spark, "/root/testdata/sf0.001")
        assert df.count() > 0, name
