"""Batch-30 regional-analysis ops: location quotient, relative-risk
surface, Huff model, 2SFCA accessibility, cross-track distance."""

import math

from pdal_spark.operators import pointpattern as ops_pp
from pdal_spark.operators import transform as ops_transform

# ---------------------------------------------------------------------------
# location_quotient
# ---------------------------------------------------------------------------


def test_location_quotient_known_mix(spark):
    # cell A: 3 x, 1 y; cell B: 1 x, 3 y. totals: x=4, y=4, n=8.
    rows = [("A", "x")] * 3 + [("A", "y")] + [("B", "x")] + [
        ("B", "y")
    ] * 3
    df = spark.createDataFrame(rows, ["cell", "cat"])
    out = {
        (r.cell, r.cat): r
        for r in ops_pp.location_quotient(df).collect()
    }
    # LQ(A,x) = (3/4) / (4/8) = 1.5; LQ(A,y) = (1/4)/(1/2) = 0.5
    assert out[("A", "x")].lq == 1.5
    assert out[("A", "y")].lq == 0.5
    assert out[("B", "y")].lq == 1.5
    assert out[("A", "x")].n_cc == 3


def test_location_quotient_uniform_is_one(spark):
    rows = [(c, k) for c in "ABC" for k in ("u", "v") for _ in range(2)]
    df = spark.createDataFrame(rows, ["cell", "cat"])
    for r in ops_pp.location_quotient(df).collect():
        assert r.lq == 1.0


# ---------------------------------------------------------------------------
# relative_risk
# ---------------------------------------------------------------------------


def test_relative_risk_known(spark):
    # cell A: 4 points 2 cases; cell B: 4 points 0 cases.
    rows = [("A", 1), ("A", 1), ("A", 0), ("A", 0),
            ("B", 0), ("B", 0), ("B", 0), ("B", 0)]
    df = spark.createDataFrame(rows, ["cell", "is_case"])
    out = {r.cell: r for r in ops_pp.relative_risk(df).collect()}
    # expected_A = 2 * 4/8 = 1 -> rr = 2; expected_B = 1 -> rr = 0
    assert out["A"].rr == 2.0
    assert out["B"].rr == 0.0
    # shrinkage pulls toward 1: k=1 -> rr_eb(A) = 3/2, rr_eb(B) = 1/2
    assert out["A"].rr_eb == 1.5
    assert out["B"].rr_eb == 0.5


# ---------------------------------------------------------------------------
# huff_model
# ---------------------------------------------------------------------------


def test_huff_equidistant_equal_weight_splits_half(spark):
    origins = spark.createDataFrame([(1, 0, 0)], ["oid", "mx", "my"])
    fac = spark.createDataFrame(
        [(10, 100, 0, 5), (11, -100, 0, 5)], ["fid", "mx", "my", "w"]
    )
    out = ops_pp.huff_model(origins, fac).collect()
    assert {r.p for r in out} == {0.5}


def test_huff_closer_facility_wins(spark):
    origins = spark.createDataFrame([(1, 0, 0)], ["oid", "mx", "my"])
    fac = spark.createDataFrame(
        [(10, 10, 0, 3), (11, 1000, 0, 3)], ["fid", "mx", "my", "w"]
    )
    out = {r.fid: r.p for r in
           ops_pp.huff_model(origins, fac).collect()}
    assert out[10] > 0.99 and out[11] < 0.01
    assert abs(out[10] + out[11] - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# two_sfca
# ---------------------------------------------------------------------------


def test_two_sfca_known_catchments(spark):
    # supply at origin, cap 10; demand: two points in radius
    # (pop 3 + 7 = 10), one point outside.
    demand = spark.createDataFrame(
        [(1, 0, 0, 3), (2, 50, 0, 7), (3, 10_000, 0, 99)],
        ["did", "mx", "my", "pop"],
    )
    supply = spark.createDataFrame(
        [(100, 0, 0, 10)], ["sid", "mx", "my", "cap"]
    )
    out = {r.did: r for r in
           ops_pp.two_sfca(demand, supply, radius=100).collect()}
    rq = (10 * ops_pp.TWOSFCA_Q) // 10  # cap*Q // pop_within
    assert out[1].a_q == rq and out[2].a_q == rq
    assert out[1].n_fac == 1
    assert out[3].a_q == 0 and out[3].n_fac == 0


def test_two_sfca_competition_dilutes(spark):
    # one person vs a crowd sharing the same facility
    demand_solo = spark.createDataFrame(
        [(1, 0, 0, 1)], ["did", "mx", "my", "pop"]
    )
    demand_crowd = spark.createDataFrame(
        [(1, 0, 0, 1), (2, 1, 0, 999)], ["did", "mx", "my", "pop"]
    )
    supply = spark.createDataFrame(
        [(9, 0, 0, 5)], ["sid", "mx", "my", "cap"]
    )
    a_solo = {r.did: r.a_q for r in
              ops_pp.two_sfca(demand_solo, supply, 10).collect()}[1]
    a_crowd = {r.did: r.a_q for r in
               ops_pp.two_sfca(demand_crowd, supply, 10).collect()}[1]
    assert a_solo == 5 * ops_pp.TWOSFCA_Q
    assert a_crowd == (5 * ops_pp.TWOSFCA_Q) // 1000
    assert a_crowd < a_solo


# ---------------------------------------------------------------------------
# cross_track_distance
# ---------------------------------------------------------------------------


def test_cross_track_on_route_is_zero(spark):
    # equator route, point on the equator between the endpoints
    df = spark.createDataFrame([(0.0, 30.0)], ["lat", "lon"])
    r = ops_transform.cross_track_distance(
        df, "lat", "lon", 0.0, 0.0, 0.0, 90.0
    ).collect()[0]
    assert abs(r.dxt_km) < 1e-5
    # along-track = arc from (0,0) to (0,30): 30 degrees of equator
    assert abs(r.dat_km - math.radians(30.0) * 6371.0088) < 1e-3


def test_cross_track_north_of_equator_route(spark):
    # 1 degree north of the eastbound equator route: |dxt| ~ 1
    # degree of meridian arc, NEGATIVE (north = left of course;
    # positive means right, the aviation-formulary convention)
    df = spark.createDataFrame([(1.0, 45.0)], ["lat", "lon"])
    r = ops_transform.cross_track_distance(
        df, "lat", "lon", 0.0, 0.0, 0.0, 90.0
    ).collect()[0]
    assert abs(-r.dxt_km - math.radians(1.0) * 6371.0088) < 1e-2
    assert r.dxt_km < 0


def test_cross_track_sign_flips_south(spark):
    df = spark.createDataFrame(
        [(2.0, 45.0), (-2.0, 45.0)], ["lat", "lon"]
    )
    rows = {r.lat: r.dxt_km for r in ops_transform.cross_track_distance(
        df, "lat", "lon", 0.0, 0.0, 0.0, 90.0
    ).collect()}
    assert rows[-2.0] > 0 > rows[2.0]
    assert abs(rows[2.0] + rows[-2.0]) < 1e-6
