"""Reference-fixture parity tests (FIXTURES.md F2/F3/F4).

Reproduces the reference's own unit-test invariants analytically:
- crop bbox over a faux ramp: 333/1000 kept, avg ~ (5, 50, 500)
  (test/unit/filters/CropFilterTest.cpp:61-119)
- 3D sphere crop: 200/1000, avg ~ center (CropFilterTest.cpp:122-180)
- splitter over a seeded uniform box: tiles partition the points,
  per-tile bbox <= length, counts sum to N
  (test/unit/filters/SplitterTest.cpp:45-105)
- buffered splitter: membership equals a numpy oracle of the
  squareContains expansion (SplitterTest.cpp:107-210)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdal_spark.operators import crop as ops_crop
from pdal_spark.operators import splitter as ops_splitter


@pytest.fixture(scope="module")
def ramp1000(spark):
    # readers.faux mode=ramp analog (io/FauxReader.cpp, Mode::Ramp):
    # i-th of N points: min + i * (max - min) / (N - 1).
    return spark.range(1000).select(
        F.col("id"),
        (F.col("id") * (10.0 / 999.0)).alias("x"),
        (F.col("id") * (100.0 / 999.0)).alias("y"),
        (F.col("id") * (1000.0 / 999.0)).alias("z"),
    )


def test_crop_bbox_ramp_333(ramp1000):
    out = ops_crop.crop_bbox(
        ramp1000,
        {
            "x": (3.33333, 6.66666),
            "y": (33.33333, 66.66666),
            "z": (333.33333, 666.66666),
        },
    )
    rows = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("ax"),
        F.avg("y").alias("ay"),
        F.avg("z").alias("az"),
    ).collect()[0]
    assert rows["n"] == 333
    assert abs(rows["ax"] - 5.0) < 0.01
    assert abs(rows["ay"] - 50.0) < 0.1
    assert abs(rows["az"] - 500.0) < 1.0


def test_crop_bbox_outside_complement(ramp1000):
    inside = ops_crop.crop_bbox(ramp1000, {"x": (2.0, 8.0)})
    outside = ops_crop.crop_bbox(ramp1000, {"x": (2.0, 8.0)}, outside=True)
    assert inside.count() + outside.count() == 1000


def test_crop_sphere_200(ramp1000):
    # center at t=0.3 along the ramp line; radius chosen so exactly
    # the 200 points i in [200, 399] fall inside (FIXTURES.md F2).
    center = (3.0, 30.0, 300.0)
    norm = float(np.sqrt(10.0**2 + 100.0**2 + 1000.0**2))
    dist = 100.0 / 999.0 * norm
    out = ops_crop.crop_circle(
        ramp1000, center=center, distance=dist, dims=("x", "y", "z")
    )
    rows = out.agg(
        F.count(F.lit(1)).alias("n"), F.avg("x").alias("ax")
    ).collect()[0]
    assert rows["n"] == 200
    assert abs(rows["ax"] - 3.0) < 0.01


@pytest.fixture(scope="module")
def pts1065(spark):
    # FIXTURES.md F3: 1065 seeded-uniform points in a ~3000x3000 box.
    rng = np.random.default_rng(42)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(1065),
            "x": 635619.85 + rng.uniform(0, 2968, 1065),
            "y": 848899.70 + rng.uniform(0, 2747, 1065),
            "z": 406.59 + rng.uniform(0, 181, 1065),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_splitter_partitions_all_points(pts1065):
    sdf, pdf = pts1065
    ox, oy, length = 635619.85, 848899.70, 1000.0
    tiled = ops_splitter.splitter(
        sdf, x="x", y="y", length=length, origin_x=ox, origin_y=oy
    )
    out = tiled.toPandas()
    assert len(out) == 1065  # partition: no dup, no loss
    assert out["pid"].nunique() == 1065
    # per-tile extent <= length
    g = out.groupby("tile_id")
    for _, grp in g:
        assert grp["x"].max() - grp["x"].min() <= length
        assert grp["y"].max() - grp["y"].min() <= length
    # tile ids match the floor rule
    exp_tx = np.floor((pdf["x"].to_numpy() - ox) / length).astype(np.int64)
    exp_ty = np.floor((pdf["y"].to_numpy() - oy) / length).astype(np.int64)
    exp_tile = (exp_tx + (1 << 25)) * (1 << 27) + (exp_ty + (1 << 25))
    got = out.sort_values("pid")["tile_id"].to_numpy()
    assert (got == exp_tile).all()


def test_splitter_buffer_oracle(pts1065):
    sdf, pdf = pts1065
    ox, oy, length, buf = 635619.85, 848899.70, 1000.0, 20.0
    tiled = ops_splitter.splitter(
        sdf, x="x", y="y", length=length,
        origin_x=ox, origin_y=oy, buffer=buf,
    )
    got = set(
        map(tuple, tiled.select("pid", "tile_id").toPandas().to_numpy())
    )
    # numpy oracle: squareContains over all candidate neighbor tiles
    # (SplitterFilter.cpp:218-227: strict inequalities on the
    # buffer-expanded square).
    xs, ys = pdf["x"].to_numpy(), pdf["y"].to_numpy()
    tx = np.floor((xs - ox) / length).astype(np.int64)
    ty = np.floor((ys - oy) / length).astype(np.int64)
    exp = set()
    for i in range(len(xs)):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cx, cy = tx[i] + dx, ty[i] + dy
                minx = ox + cx * length - buf
                maxx = minx + length + 2 * buf
                miny = oy + cy * length - buf
                maxy = miny + length + 2 * buf
                if (dx == 0 and dy == 0) or (
                    minx < xs[i] < maxx and miny < ys[i] < maxy
                ):
                    tile = (cx + (1 << 25)) * (1 << 27) + (cy + (1 << 25))
                    exp.add((pdf["pid"][i], tile))
    assert got == exp
    assert len(got) > 1065  # buffer duplicated some edge points


def test_polygon_crop_matches_raycast_oracle(spark, pts1065):
    sdf, pdf = pts1065
    # non-convex polygon (arrow shape) covering part of the box
    wkt = (
        "POLYGON((636000 849000, 637500 849500, 636000 850000, "
        "638000 850500, 636500 851000, 638500 851500, 636000 849000))"
    )
    out = ops_crop.crop_polygons(
        sdf, [(7, wkt)], x="x", y="y"
    ).select("pid", "geom_id").toPandas()
    from pdal_spark.functions import pip, wkt as W

    rings = W.parse_polygon(wkt)
    mask = pip.polygon_contains(
        pdf["x"].to_numpy(), pdf["y"].to_numpy(), rings
    )
    exp_pids = set(pdf["pid"][mask])
    assert set(out["pid"]) == exp_pids
    assert (out["geom_id"] == 7).all()
    assert 0 < len(exp_pids) < 1065
    # outside=True is the exact complement
    comp = ops_crop.crop_polygons(
        sdf, [(7, wkt)], x="x", y="y", outside=True
    )
    assert comp.count() == 1065 - len(exp_pids)
