"""Invariant tests for batch 101: areal interpolation,
Kaplan-Meier, geodesic destination."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdal_spark.operators.overlay import areal_interpolate
from pdal_spark.operators.temporal import kaplan_meier
from pdal_spark.operators.transform import geodesic_destination


def test_areal_interpolate_splits_proportionally(spark):
    # source zone [0,100)x[0,10) value 1000 split by two target
    # halves -> 500 each; a disjoint target gets nothing
    src = spark.createDataFrame(
        [(1, 0, 100, 0, 10, 1000)],
        "sid long, x0 long, x1 long, y0 long, y1 long, value_q long",
    )
    tgt = spark.createDataFrame(
        [(1, 0, 50, 0, 10), (2, 50, 100, 0, 10),
         (3, 500, 600, 0, 10)],
        "tid long, x0 long, x1 long, y0 long, y1 long",
    )
    out = {r["tid"]: r for r in
           areal_interpolate(src, tgt, cell=64.0).collect()}
    assert out[1]["allocated_q"] == 500
    assert out[2]["allocated_q"] == 500
    assert 3 not in out


def test_areal_interpolate_conservative(spark):
    # truncation never over-allocates: total <= source value
    src = spark.createDataFrame(
        [(1, 0, 30, 0, 30, 999)],
        "sid long, x0 long, x1 long, y0 long, y1 long, value_q long",
    )
    tgt = spark.createDataFrame(
        [(i, i * 10, (i + 1) * 10, 0, 30) for i in range(3)],
        "tid long, x0 long, x1 long, y0 long, y1 long",
    )
    out = areal_interpolate(src, tgt, cell=16.0).collect()
    assert sum(r["allocated_q"] for r in out) <= 999
    assert all(r["allocated_q"] == 333 for r in out)


def test_kaplan_meier_textbook(spark):
    # 5 subjects: events at t=1 (1), t=3 (1); censored at 2, 4, 5
    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (4, 0), (5, 0)],
        "dur long, ev int",
    )
    rows = kaplan_meier(df, "dur", "ev").collect()
    assert [(r["t"], r["n_risk"], r["d_events"]) for r in rows] == [
        (1, 5, 1), (3, 3, 1)
    ]
    assert abs(rows[0]["s_r"] - 0.8) < 1e-6        # 4/5
    assert abs(rows[1]["s_r"] - 0.8 * 2 / 3) < 1e-6


def test_geodesic_destination_cardinal(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 0.0, 111.19),    # due north ~1 degree
         (2, 0.0, 0.0, 90.0, 111.19),   # due east along equator
         (3, 0.0, 0.0, 0.0, 0.0)],
        "pid long, lat double, lon double, bearing double,"
        " dist_km double",
    )
    out = {r["pid"]: r for r in geodesic_destination(df).collect()}
    assert abs(out[1]["lat2"] - 1.0) < 0.01 and abs(out[1]["lon2"]) < 1e-6
    assert abs(out[2]["lon2"] - 1.0) < 0.01 and abs(out[2]["lat2"]) < 1e-6
    assert out[3]["lat2"] == 0.0 and out[3]["lon2"] == 0.0


def test_gates_smoke_sf0001(spark):
    from pdal_spark.gate import GATES

    for name in ["areal_interp", "kaplan_meier",
                 "geodesic_destination"]:
        df = GATES[name].spark_fn(spark, "/root/testdata/sf0.001")
        assert df.count() > 0, name
