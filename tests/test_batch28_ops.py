"""Batch-28 ops: weighted_pagerank, spatial_join_estimate."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import knn as ops_knn


def test_weighted_pagerank_follows_the_heavy_edge(spark):
    # hub 0 links 1 once and 2 nine times: 2 must outrank 1.
    edges = [(0, 1, 1), (0, 2, 9), (1, 0, 1), (2, 0, 1)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    out = {r.node: r.wpr for r in
           ops_graph.weighted_pagerank(df, iters=3).collect()}
    assert out[2] > out[1]
    # unit weights reduce to plain pagerank proportions: symmetric
    sym = spark.createDataFrame(
        [(0, 1, 1), (1, 0, 1)], ["src", "dst", "w"]
    )
    o2 = {r.node: r.wpr for r in
          ops_graph.weighted_pagerank(sym, iters=4).collect()}
    assert o2[0] == o2[1]


def test_spatial_join_estimate_upper_bounds_truth(spark):
    pts = spark.range(3000).selectExpr(
        "id AS pid",
        "cast(((id * 48271) % 800) as double) / 10.0 AS lon",
        "cast(((id * 69621) % 800) as double) / 10.0 AS lat",
    )
    r = 2.0
    est = ops_knn.spatial_join_estimate(pts, pts, r).collect()[0]
    true_pairs = ops_knn.radius_join(
        pts, pts, r, id_left="pid", id_right="pid"
    ).count()
    assert est.candidates >= true_pairs
    # and not uselessly loose: candidates within ~9x cell-density
    assert est.candidates < true_pairs * 12
    assert est.hot_cell_pairs <= est.candidates


def test_focal_minmax_morphology(spark):
    from pdal_spark.operators import raster as ops_raster
    from pdal_spark.sqlgen import qcell_pack

    vals = {(ix, iy): 5 for ix in range(4, 9) for iy in range(4, 9)}
    vals[(6, 6)] = 50  # speck
    rows = [(int(eval(qcell_pack(str(ix), str(iy), 4))), x)
            for (ix, iy), x in vals.items()]
    df = spark.createDataFrame(rows, ["cell", "x"])
    out = {r.cell: r for r in
           ops_raster.focal_minmax(df, res=4).collect()}
    speck = int(eval(qcell_pack("6", "6", 4)))
    far = int(eval(qcell_pack("4", "4", 4)))
    # erosion removes the speck; dilation spreads it to neighbors
    assert out[speck].eroded == 5
    assert out[speck].dilated == 50
    nbr = int(eval(qcell_pack("6", "7", 4)))
    assert out[nbr].dilated == 50
    assert out[far].dilated == 5


def test_rfm_paths_peak_smoke(spark):
    import pyspark.sql.functions as F

    from pdal_spark.operators.temporal import (peak_hour, rfm_scores,
                                               top_session_paths)

    rows = [
        (1, 7, "2024-01-01 09:00:00", "a", 10.0),
        (2, 7, "2024-01-01 09:30:00", "b", 5.0),
        (3, 7, "2024-01-02 09:10:00", "a", 2.5),
        (4, 8, "2024-01-03 17:00:00", "b", 1.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value"]
    ).withColumn("ts", F.to_timestamp("ts"))
    rfm = {r.user_id: r for r in
           rfm_scores(df, "2024-01-04 00:00:00").collect()}
    assert rfm[7].frequency == 3 and rfm[7].monetary_q == 17500
    assert rfm[8].recency_s == 7 * 3600
    paths = {r.path: r.n_keys
             for r in top_session_paths(df, depth=3).collect()}
    assert paths == {"a>b>a": 1, "b": 1}
    peaks = {r.user_id: r for r in peak_hour(df).collect()}
    assert peaks[7].peak_hr == 9 and peaks[7].share_q == 1 << 20


def test_cell_dwell_and_log_odds_smoke(spark):
    import pyspark.sql.functions as F

    from pdal_spark.operators.hexbin import cell_dwell
    from pdal_spark.operators.textops import log_odds_keywords

    rows = [
        (1, 7, "2024-01-01 00:00:00", 10.0, 10.0),  # 1h in cell A
        (2, 7, "2024-01-01 01:00:00", 50.0, 50.0),  # 10s in cell B
        (3, 7, "2024-01-01 01:00:10", 10.0, 10.0),  # tail, no gap
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "lat", "lon"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.cell: r.dwell_s for r in cell_dwell(df, res=6).collect()}
    assert sorted(out.values()) == [10, 3600]

    a = spark.createDataFrame(
        [(1, "sparkle sparkle common")], ["doc_id", "text"]
    )
    b = spark.createDataFrame(
        [(2, "dull dull common")], ["doc_id", "text"]
    )
    top = log_odds_keywords(a, b, top_k=1).collect()[0]
    assert top.word == "sparkle" and top.delta_q > 0
