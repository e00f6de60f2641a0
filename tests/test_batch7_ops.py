"""Batch-7 ops: degree_assortativity, morton_ranges, silhouette."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import cluster as ops_cluster
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import h3 as ops_h3


def test_assortativity_star_is_negative_clique_degenerate(spark):
    # Star K1,4: every edge joins degree-4 to degree-1 -> perfectly
    # disassortative, r = -1.
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], ["src", "dst"]
    )
    row = ops_graph.degree_assortativity(star).collect()[0]
    assert row.m2 == 8
    assert row.r == pytest.approx(-1.0)

    # Regular graph (4-cycle): zero degree variance -> den = 0 ->
    # r undefined (NaN/None); moments still exact.
    cyc = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], ["src", "dst"]
    )
    r2 = ops_graph.degree_assortativity(cyc).collect()[0]
    assert r2.m2 == 8 and r2.sxx * r2.m2 == r2.sx * r2.sx


def test_morton_ranges_cover_bbox_exactly(spark):
    out = ops_h3.morton_ranges(
        spark, -10.0, 25.0, 40.0, 61.0, res=7
    ).collect()
    # ranges are disjoint, sorted, and cover exactly nx*ny cells
    total = sum(r.n_cells for r in out)
    ix0 = ops_h3._py_grid_index(-10.0, -180.0, 360.0, 7)
    ix1 = ops_h3._py_grid_index(25.0, -180.0, 360.0, 7)
    iy0 = ops_h3._py_grid_index(40.0, -90.0, 180.0, 7)
    iy1 = ops_h3._py_grid_index(61.0, -90.0, 180.0, 7)
    assert total == (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    for a, b in zip(out, out[1:]):
        assert a.range_end < b.range_start - 1  # truly merged
    for r in out:
        assert r.range_end - r.range_start + 1 == r.n_cells
    # far fewer ranges than cells: the planner actually merges
    assert len(out) < total / 4


def test_silhouette_separated_clusters_near_one(spark):
    # Two tight far-apart blobs labeled correctly: sil ~ 1 for all.
    rows = [(i, 0.0 + i * 0.01, 0.0, 0) for i in range(5)]
    rows += [(10 + i, 100.0 + i * 0.01, 0.0, 1) for i in range(5)]
    df = spark.createDataFrame(rows, ["pid", "px", "py", "cluster_id"])
    out = ops_cluster.silhouette_simplified(df).collect()
    assert all(r.sil > 0.99 for r in out)

    # Mislabeled point lands negative.
    rows[0] = (0, 100.02, 0.0, 0)  # claims cluster 0, sits in blob 1
    df2 = spark.createDataFrame(rows, ["pid", "px", "py", "cluster_id"])
    out2 = {r.pid: r.sil for r in
            ops_cluster.silhouette_simplified(df2).collect()}
    assert out2[0] < 0
