"""Batch-30: colorinterp k-stddev auto-bounds, normals MST-style
refine (VERDICT r1 #10)."""

import math

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import features as ops_features
from pdal_spark.operators import transform as ops_transform


def test_colorinterp_stddev_bounds(spark):
    # values 0..99: mean 49.5, pop std = sqrt((n^2-1)/12) ~ 28.866
    df = spark.range(100).selectExpr("cast(id as double) AS v")
    out = ops_transform.colorinterp_stddev(df, "v", k=1.0)
    rows = {r.v: (r.red, r.green, r.blue) for r in out.collect()}
    std = math.sqrt((100.0 * 100.0 - 1.0) / 12.0)
    lo, hi = 49.5 - std, 49.5 + std
    # below-lo values clamp to the first ramp color, above-hi to last
    assert rows[0.0] == (0, 0, 255)
    assert rows[99.0] == (255, 0, 0)
    # a mid value lands mid-ramp
    n = 6
    b = min(max(int((49.5 - lo) / (hi - lo) * n), 0), n - 1)
    assert b in (2, 3)
    # same-valued column -> std 0 -> all one bucket, no crash
    const = spark.range(10).selectExpr("cast(5 as double) AS v")
    out2 = ops_transform.colorinterp_stddev(const, "v").collect()
    assert len({(r.red, r.green, r.blue) for r in out2}) == 1


def _line_points(spark, n=12):
    # points along the x axis: true normals are +/-y; eigen-normals
    # come out sign-mixed only by tie-break, so flip half manually
    rows = []
    for i in range(n):
        sign = -1.0 if i % 3 == 0 else 1.0
        rows.append((i, float(i), 0.0, 0.0, sign))
    return spark.createDataFrame(
        rows, ["pid", "lon", "lat", "normal_x", "normal_y"]
    )


def test_normals_refine_makes_line_consistent(spark):
    df = _line_points(spark)
    out = ops_features.normals_refine(df, radius=1.5).collect()
    ys = [r.normal_y for r in out]
    # all normals agree in sign after refinement
    assert len({y > 0 for y in ys}) == 1
    # seed (pid 0, a local min) kept its original sign (-1)
    assert all(y < 0 for y in ys)
    # magnitudes untouched
    assert all(abs(abs(y) - 1.0) < 1e-12 for y in ys)


def test_normals_refine_components_independent(spark):
    # two far-apart clusters: each oriented internally, independently
    rows = []
    for i in range(5):
        rows.append((i, float(i), 0.0, 0.0, 1.0 if i else -1.0))
    for i in range(5, 10):
        rows.append((i, 1000.0 + i, 0.0, 0.0, 1.0))
    df = spark.createDataFrame(
        rows, ["pid", "lon", "lat", "normal_x", "normal_y"]
    )
    out = {r.pid: r.normal_y for r in
           ops_features.normals_refine(df, radius=1.5).collect()}
    assert len({out[i] > 0 for i in range(5)}) == 1
    assert len({out[i] > 0 for i in range(5, 10)}) == 1
    # cluster 2's seed is pid 5 (+1): stays positive
    assert out[5] > 0
    # cluster 1's seed is pid 0 (-1): whole cluster negative
    assert out[0] < 0 and out[4] < 0


def _tree_cluster(cx, cy, peak, pid0):
    # 3x3 canopy, 0.5 m spacing, peak at center (FIRST id — the
    # reference classifies in U order, so a skirt processed before
    # its own peak can get absorbed by an earlier tree), skirt 2 m
    # lower
    rows = [(pid0, cx, cy, peak)]
    pid = pid0 + 1
    for i in range(3):
        for j in range(3):
            if i == 1 and j == 1:
                continue
            x, y = cx + (i - 1) * 0.5, cy + (j - 1) * 0.5
            rows.append((pid, x, y, peak - 2.0))
            pid += 1
    return rows


def test_litree_segments_two_trees(spark):
    from pdal_spark.operators.cluster import litree

    rows = _tree_cluster(0.0, 0.0, 20.0, 0)
    rows += _tree_cluster(6.0, 0.0, 10.0, 100)
    rows.append((500, 50.0, 50.0, 8.0))  # isolated point
    df = spark.createDataFrame(rows, ["pid", "lon", "lat", "hag"])
    out = {r.pid: r.tree_id for r in
           litree(df, min_points=5, min_height=3.0).collect()}
    a = {out[p] for p in range(9)}
    b = {out[p] for p in range(100, 109)}
    assert a == {1}          # tallest tree segmented first
    assert b == {2}
    assert out[500] == 0     # isolated: never forms a tree
    assert len(out) == len(rows)


def test_litree_min_height_terminates(spark):
    from pdal_spark.operators.cluster import litree

    rows = _tree_cluster(0.0, 0.0, 2.0, 0)  # peak below min_height
    df = spark.createDataFrame(rows, ["pid", "lon", "lat", "hag"])
    out = {r.pid: r.tree_id for r in
           litree(df, min_points=5, min_height=3.0).collect()}
    assert set(out.values()) == {0}


def test_ogr_features_multipoint_and_measure(spark):
    import json

    from pdal_spark.sources.text import ogr_features

    df = spark.createDataFrame(
        [(i, float(i), float(-i), float(i * 10), "d%d" % (i // 3))
         for i in range(7)],
        ["pid", "lon", "lat", "m", "tag"],
    )
    # multicount=3: features of 3,3,1 consecutive points by pid
    feats = [json.loads(r.feature) for r in ogr_features(
        df, multicount=3, order="pid", measure_dim="m",
        attrs=["tag"],
    ).collect()]
    assert [len(f["geometry"]["coordinates"]) for f in feats] == [3, 3, 1]
    assert feats[0]["geometry"]["type"] == "MultiPoint"
    assert feats[0]["geometry"]["coordinates"][0] == [0.0, -0.0, 0.0]
    assert feats[1]["geometry"]["coordinates"][0][2] == 30.0  # measure
    assert feats[0]["properties"] == {"tag": "d0"}
    # plain point path keeps all non-coordinate attrs
    pts = [json.loads(r.feature) for r in
           ogr_features(df, attrs=None).collect()]
    assert all(p["geometry"]["type"] == "Point" for p in pts)
    assert {p["properties"]["pid"] for p in pts} == set(range(7))
    import pytest as _pt

    with _pt.raises(ValueError):
        ogr_features(df, multicount=2).collect()


def test_boilerplate_strip_drops_nav_lines(spark):
    from pdal_spark.operators.textops import boilerplate_strip

    doc = "\n".join([
        "Home | About | Contact",                       # nav: no stopwords
        "Accept cookies",                               # short
        "The quick brown fox jumped over the lazy dog in the park",
        "Copyright 2024 Example Corp",                  # no stopwords
        "It is a truth universally acknowledged that a single man",
    ])
    df = spark.createDataFrame([(1, doc)], ["doc_id", "text"])
    r = boilerplate_strip(df).collect()[0]
    kept = r.clean_text.split("\n")
    assert r.n_lines_total == 5
    assert r.n_lines_kept == 2
    assert kept[0].startswith("The quick")
    assert kept[1].startswith("It is")
    # all-boilerplate doc -> empty string, not NULL
    df2 = spark.createDataFrame([(2, "Home | About")],
                                ["doc_id", "text"])
    assert boilerplate_strip(df2).collect()[0].clean_text == ""


def test_straighten_l_corridor_and_roundtrip(spark):
    line = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]
    df = spark.createDataFrame(
        [(1, 3.0, 1.0), (2, 12.0, 7.0), (3, 9.0, -0.5), (4, 10.0, 10.0)],
        ["pid", "lon", "lat"],
    )
    out = {r.pid: (r.s, r.t) for r in
           ops_transform.straighten(df, line).collect()}
    assert out[1] == (3.0, 1.0)      # along first segment, left
    assert out[2] == (17.0, -2.0)    # second segment, right
    assert out[3] == (9.0, -0.5)
    assert out[4] == (20.0, 0.0)     # endpoint
    # unstraighten inverts points whose projection was unclamped
    st = ops_transform.straighten(df, line)
    back = ops_transform.straighten(
        st.drop("lon", "lat"), line, unstraighten=True
    ).collect()
    got = {r.pid: (r.lon, r.lat) for r in back}
    assert got[1] == pytest.approx((3.0, 1.0))
    assert got[2] == pytest.approx((12.0, 7.0))
    assert got[3] == pytest.approx((9.0, -0.5))
