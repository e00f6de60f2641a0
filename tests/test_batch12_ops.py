"""Batch-12 ops: postings_varint_stats, idw_at_points, cohen_kappa."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import textops as ops_text


def test_postings_varint_known_gaps(spark):
    # "w" appears in docs 1, 200, 100000: first posting absolute (1
    # byte), gaps 199 (2 bytes) and 99800 (3 bytes).
    df = spark.createDataFrame(
        [(1, "w"), (200, "w"), (100000, "w")], ["doc_id", "text"]
    )
    r = ops_text.postings_varint_stats(df).collect()[0]
    assert r.df_docs == 3
    assert r.max_gap == 99800
    assert r.varint_bytes == 1 + 2 + 3
    assert r.ratio_q == (6 * (1 << 20)) // 24


def test_idw_interpolates_between_samples(spark):
    q = spark.createDataFrame([(1, 0.0, 0.0)], ["qid", "lat", "lon"])
    s = spark.createDataFrame(
        [
            (10, 0.0, 1.0, 100.0),
            (11, 0.0, -1.0, 200.0),  # symmetric -> mean
            (12, 0.0, 50.0, 9999.0),  # out of radius
        ],
        ["sid", "lat", "lon", "value"],
    )
    r = ops_raster.idw_at_points(q, s, 5.0).collect()[0]
    assert r.n_samples == 2
    assert r.idw == pytest.approx(150.0, abs=0.01)

    # coincident sample dominates
    s2 = s.union(
        spark.createDataFrame([(13, 0.0, 0.0, 500.0)],
                              ["sid", "lat", "lon", "value"])
    )
    r2 = ops_raster.idw_at_points(q, s2, 5.0).collect()[0]
    assert abs(r2.idw - 500.0) < 1.0


def test_cohen_kappa_perfect_and_chance(spark):
    perfect = spark.createDataFrame(
        [("x", "x")] * 5 + [("y", "y")] * 5, ["a", "b"]
    )
    r = ops_stats.cohen_kappa(perfect, "a", "b").collect()[0]
    assert r.kappa == pytest.approx(1.0)

    # independent marginals (balanced): kappa ~ 0
    rows = [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")] * 3
    r2 = ops_stats.cohen_kappa(
        spark.createDataFrame(rows, ["a", "b"]), "a", "b"
    ).collect()[0]
    assert r2.kappa == pytest.approx(0.0)

    # single-label degenerate: pe == n^2 -> NULL
    one = spark.createDataFrame([("x", "x")] * 4, ["a", "b"])
    r3 = ops_stats.cohen_kappa(one, "a", "b").collect()[0]
    assert r3.kappa is None
