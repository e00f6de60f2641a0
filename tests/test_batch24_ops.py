"""Batch-24 ops: simplify_polyline, focal_mean, focal_gradient."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import transform as ops_transform
from pdal_spark.sqlgen import qcell_pack


def _cells(spark, vals, res=4):
    rows = []
    for (ix, iy), x in vals.items():
        cell = int(eval(qcell_pack(str(ix), str(iy), res)))
        rows.append((cell, x))
    return spark.createDataFrame(rows, ["cell", "x"])


def test_simplify_drops_collinear_keeps_corners(spark):
    # an L-shaped track with redundant collinear mid points
    rows = [
        (1, 1, "2024-01-01 00:00:00", 0.0, 0.0),
        (2, 1, "2024-01-01 00:01:00", 0.0, 1.0),   # collinear
        (3, 1, "2024-01-01 00:02:00", 0.0, 2.0),   # corner
        (4, 1, "2024-01-01 00:03:00", 1.0, 2.0),   # collinear
        (5, 1, "2024-01-01 00:04:00", 2.0, 2.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "lat", "lon"]
    ).withColumn("ts", F.to_timestamp("ts"))
    q = ops_transform.VW_COORD_Q
    # eps just above zero-area: removes collinear points only
    out = ops_transform.simplify_polyline(
        df, eps_area2_q=10, rounds=2
    )
    kept = sorted(r.event_id for r in out.collect())
    assert kept == [1, 3, 5]
    # endpoints always survive even with a huge epsilon
    out2 = ops_transform.simplify_polyline(
        df, eps_area2_q=1 << 60, rounds=3
    )
    kept2 = sorted(r.event_id for r in out2.collect())
    assert kept2[0] == 1 and kept2[-1] == 5


def test_focal_mean_smooths_spike(spark):
    vals = {(ix, iy): 0 for ix in range(4, 9) for iy in range(4, 9)}
    vals[(6, 6)] = 90
    df = _cells(spark, vals)
    out = {r.cell: r for r in
           ops_raster.focal_mean(df, res=4).collect()}
    q = ops_raster.FOCAL_Q
    spike = int(eval(qcell_pack("6", "6", 4)))
    nbr = int(eval(qcell_pack("6", "7", 4)))
    far = int(eval(qcell_pack("4", "4", 4)))
    assert out[spike].mean_q == (90 * q) // 9
    assert out[nbr].mean_q == (90 * q) // 9
    assert out[far].mean_q == 0


def test_focal_gradient_directions(spark):
    # field x = 10 * ix: east-west gradient 20 per 2 cells, no N-S
    vals = {(ix, iy): 10 * ix
            for ix in range(4, 9) for iy in range(4, 9)}
    df = _cells(spark, vals)
    out = {r.cell: r for r in
           ops_raster.focal_gradient(df, res=4).collect()}
    mid = int(eval(qcell_pack("6", "6", 4)))
    edge = int(eval(qcell_pack("4", "6", 4)))
    assert out[mid].gx2 == 20 and out[mid].gy2 == 0
    # western edge lacks a W neighbor -> NULL gx2
    assert out[edge].gx2 is None
