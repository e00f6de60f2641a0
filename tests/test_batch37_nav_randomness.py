"""Batch-37 ops: route waypoints (slerp), runs test, segregation
indices, compression ratio."""

import math
import zlib

import pytest

from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import textops as ops_text
from pdal_spark.operators import transform as ops_transform

# ---------------------------------------------------------------------------
# route_waypoints
# ---------------------------------------------------------------------------


def test_waypoints_equator_route_even_spacing(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 0.0, 60.0)],
        ["rid", "lat1", "lon1", "lat2", "lon2"],
    )
    out = {r.i: r for r in
           ops_transform.route_waypoints(df, n=6).collect()}
    assert len(out) == 7
    for i in range(7):
        assert out[i].wlat == pytest.approx(0.0, abs=1e-6)
        assert out[i].wlon == pytest.approx(10.0 * i, abs=1e-5)


def test_waypoints_endpoints_exact(spark):
    df = spark.createDataFrame(
        [(1, 10.0, -20.0, 45.0, 60.0)],
        ["rid", "lat1", "lon1", "lat2", "lon2"],
    )
    out = {r.i: r for r in
           ops_transform.route_waypoints(df, n=4).collect()}
    assert (out[0].wlat, out[0].wlon) == (10.0, -20.0)
    assert out[4].wlat == pytest.approx(45.0, abs=1e-5)
    assert out[4].wlon == pytest.approx(60.0, abs=1e-5)


def test_waypoints_coincident_endpoints(spark):
    df = spark.createDataFrame(
        [(1, 30.0, 40.0, 30.0, 40.0)],
        ["rid", "lat1", "lon1", "lat2", "lon2"],
    )
    for r in ops_transform.route_waypoints(df, n=3).collect():
        assert (r.wlat, r.wlon) == (30.0, 40.0)


# ---------------------------------------------------------------------------
# runs_test
# ---------------------------------------------------------------------------


def test_runs_alternating_max_runs(spark):
    rows = [(1, i, 1 if i % 2 == 0 else -1) for i in range(10)]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    r = ops_stats.runs_test(df, "k", "o", "v").collect()[0]
    assert r.runs == 10 and r.n1 == 5 and r.n2 == 5
    # mu = 6, sigma^2 = 2*25*(50-10)/(100*9) = 20/9
    assert r.z == pytest.approx((10 - 6) / math.sqrt(20 / 9.0),
                                abs=1e-12)


def test_runs_blocked_min_runs(spark):
    rows = [(1, i, 1) for i in range(5)] + [(1, 5 + i, -1)
                                            for i in range(5)]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    r = ops_stats.runs_test(df, "k", "o", "v").collect()[0]
    assert r.runs == 2
    assert r.z < 0


def test_runs_one_sided_null_z(spark):
    rows = [(1, i, 5) for i in range(4)]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    r = ops_stats.runs_test(df, "k", "o", "v").collect()[0]
    assert r.runs == 1 and r.z is None


# ---------------------------------------------------------------------------
# segregation_indices
# ---------------------------------------------------------------------------


def test_segregation_complete_separation(spark):
    cells = spark.createDataFrame(
        [(10, 0), (0, 10)], ["g1", "g2"]
    )
    r = ops_stats.segregation_indices(cells).collect()[0]
    assert r.d_index == 1.0
    assert r.isolation == pytest.approx(1.0, abs=1e-6)


def test_segregation_perfect_mixing(spark):
    cells = spark.createDataFrame(
        [(5, 5), (5, 5)], ["g1", "g2"]
    )
    r = ops_stats.segregation_indices(cells).collect()[0]
    assert r.d_index == 0.0
    assert r.isolation == pytest.approx(0.5, abs=1e-6)


# ---------------------------------------------------------------------------
# compression_ratio
# ---------------------------------------------------------------------------


def test_compression_repetitive_below_random(spark):
    rep = "spam " * 200
    mixed = " ".join(f"w{i * 7919 % 1000}x{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, rep), (2, mixed), (3, None), (4, "")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.ratio_q for r in
           ops_text.compression_ratio(df).collect()}
    assert out[1] < out[2]
    assert out[3] is None and out[4] is None
    # exact pin against the local zlib
    raw = rep.encode()
    assert out[1] == len(zlib.compress(raw, 6)) * (1 << 20) // len(raw)
