"""Invariant tests for the batch-97 ops: readability, Yule's K,
IDW LOOCV, polygon compactness, emerging hotspots."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pdal_spark.operators.features import polygon_compactness
from pdal_spark.operators.raster import idw_loocv
from pdal_spark.operators.temporal import emerging_hotspots
from pdal_spark.operators.textops import readability_scores, yules_k


def test_readability_known_text(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat. it was flat!"),
         (2, "incomprehensibility notwithstanding institutionalization")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in readability_scores(docs).collect()}
    r1 = rows[1]
    assert r1["n_words"] == 9
    assert r1["n_sents"] == 2
    # e,a,a,o,e,a,i,a,a = 9 vowel groups
    assert r1["n_syll"] == 9
    assert r1["n_poly"] == 0
    assert r1["flesch"] > 90  # trivially easy text
    r2 = rows[2]
    assert r2["n_poly"] == 3
    assert r2["flesch"] < 0  # pathological polysyllabic run


def test_yules_k_repetitive_vs_rich(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a a a a a"),
         (2, "b c d e f g h i")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in yules_k(docs).collect()}
    # all-same: sum_f2 = 64, N = 8 -> K = 1e4 * 56/64 = 8750
    assert rows[1]["yules_k"] == 8750.0
    # all-distinct: sum_f2 = N -> K = 0
    assert rows[2]["yules_k"] == 0.0
    assert rows[1]["yules_k"] > rows[2]["yules_k"]


def test_idw_loocv_smooth_field_low_error(spark):
    # linear field v = x: LOO estimate of interior points is near-
    # exact by symmetry (neighbors left/right cancel)
    pts = [(i, float(i), 0.0, float(i)) for i in range(20)]
    df = spark.createDataFrame(
        pts, "sid long, lon double, lat double, value double"
    )
    out = idw_loocv(df, radius=1.5, id_col="sid").collect()
    by_id = {r["sid"]: r for r in out}
    # interior point: both neighbors at d=1, mean of i-1, i+1 = i
    assert by_id[10]["err_q"] == 0
    # edge point 0: only neighbor is 1 -> estimate 1000, err 1000
    assert by_id[0]["err_q"] == 1000


def test_idw_loocv_isolated_point_drops(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 5.0), (2, 100.0, 0.0, 7.0)],
        "sid long, lon double, lat double, value double",
    )
    assert idw_loocv(df, radius=1.0, id_col="sid").count() == 0


def test_polygon_compactness_square_vs_sliver(spark):
    def poly(pid, pts):
        return [(pid, i, x, y) for i, (x, y) in enumerate(pts)]

    sq = poly(1, [(0, 0), (100, 0), (100, 100), (0, 100)])
    sliver = poly(2, [(0, 0), (1000, 0), (1000, 2), (0, 2)])
    df = spark.createDataFrame(
        sq + sliver, "poly_id long, seq long, xq long, yq long"
    )
    rows = {r["poly_id"]: r for r in polygon_compactness(df).collect()}
    # square: pp = pi/4
    assert abs(rows[1]["pp"] - math.pi / 4) < 1e-6
    assert rows[1]["a2"] == 2 * 100 * 100
    assert rows[1]["perim_q"] == 400 * 1000
    assert rows[2]["pp"] < 0.05  # sliver is maximally non-compact
    assert rows[1]["pp"] > rows[2]["pp"]


def test_emerging_hotspots_trends(spark):
    # cell A: rising counts by day; cell B: falling; both hot
    rows = []
    eid = 0
    for day in range(10):
        for _ in range(5 + day * 3):  # rising
            rows.append((eid, 10.0, 10.0,
                         f"2024-01-{day + 1:02d} 12:00:00")); eid += 1
        for _ in range(35 - day * 3):  # falling
            rows.append((eid, -120.0, -40.0,
                         f"2024-01-{day + 1:02d} 12:00:00")); eid += 1
    df = spark.createDataFrame(
        rows, "eid long, lon double, lat double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = emerging_hotspots(df, res=3, min_total=100).collect()
    labels = {r["cell"]: r["label"] for r in out}
    assert sorted(labels.values()) == ["fading-hot", "rising-hot"]


def test_gates_smoke_sf0001(spark):
    from pdal_spark.gate import GATES

    for name in ["readability", "yules_k", "idw_loocv",
                 "polygon_compactness", "emerging_hotspots"]:
        df = GATES[name].spark_fn(spark, "/root/testdata/sf0.001")
        assert df.count() > 0, name
