"""Batch-18 ops: label_centroids, ncm_classify, cell_area_km2."""

import math

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import similarity as ops_sim


def test_ncm_classifies_separable_blobs(spark):
    train = spark.createDataFrame(
        [
            (0, "a", [10.0, 0.0]), (2, "a", [12.0, 1.0]),
            (4, "b", [0.0, 10.0]), (6, "b", [1.0, 12.0]),
        ],
        "vec_id long, label string, qvec array<double>",
    )
    probe = spark.createDataFrame(
        [(1, [11.0, 0.0]), (3, [0.0, 11.0])],
        "vec_id long, qvec array<double>",
    )
    cent = ops_sim.label_centroids(train)
    assert cent.count() == 4  # 2 labels x 2 dims
    out = {r.vec_id: r.pred for r in
           ops_sim.ncm_classify(probe, cent).collect()}
    assert out == {1: "a", 3: "b"}


def test_label_centroid_values_exact(spark):
    df = spark.createDataFrame(
        [(0, "x", [1.0, 3.0]), (1, "x", [2.0, 5.0])],
        "vec_id long, label string, qvec array<double>",
    )
    q = ops_sim.NCM_Q
    out = {(r.label, r.dim): r.cq
           for r in ops_sim.label_centroids(df).collect()}
    assert out[("x", 0)] == (3 * q) // 2
    assert out[("x", 1)] == (8 * q) // 2


def test_cell_areas_shrink_toward_pole_and_sum_to_sphere(spark):
    res = 3
    n = 1 << res
    # all cells in one longitude column
    from pdal_spark.sqlgen import qcell_pack
    rows = [(int(eval(qcell_pack("0", str(iy), res))),)
            for iy in range(n)]
    df = spark.createDataFrame(rows, ["h3_cell"])
    out = ops_h3.cell_area_km2(df, res=res).collect()
    areas = {r.h3_cell: r.area_km2 for r in out}
    vals = [areas[c[0]] for c in rows]
    # equator cells biggest, polar cells smallest
    assert vals[n // 2] > vals[0] > 0
    assert vals[0] == pytest.approx(vals[-1], rel=1e-9)
    # column areas x n columns == sphere surface
    sphere = 4.0 * math.pi * 6371.0088 ** 2
    assert sum(vals) * n == pytest.approx(sphere, rel=1e-6)
