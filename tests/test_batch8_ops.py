"""Batch-8 ops: crop_polygons_celljoin, cusum_changepoint, mmr_rerank."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import crop as ops_crop
from pdal_spark.operators import similarity as ops_sim
from pdal_spark.operators import temporal as ops_temporal


def test_celljoin_equals_broadcast_crop(spark):
    # Same polygons through the literal-broadcast path and the
    # cell-join table path -> identical (point, geom) sets.
    polys = [
        (0, "POLYGON ((0.1 0.1, 9.7 0.3, 5.1 8.9, 0.1 0.1))"),
        (1, "POLYGON ((-5.3 -5.1, 3.1 -4.7, -1.2 2.9, -5.3 -5.1))"),
        (2, "POLYGON ((40.1 40.2, 49.3 41.1, 44.9 48.7, 40.1 40.2))"),
    ]
    pts = spark.range(4000).selectExpr(
        "id AS pid",
        "cast(((id * 48271) % 1200) as double) / 10.0 - 20.0 AS lon",
        "cast(((id * 69621) % 1400) as double) / 10.0 - 10.0 AS lat",
    )
    bc = {
        (r.pid, r.geom_id)
        for r in ops_crop.crop_polygons(pts, polys).collect()
    }
    pdf = spark.createDataFrame(polys, "geom_id int, wkt string")
    cj = {
        (r.pid, r.geom_id)
        for r in ops_crop.crop_polygons_celljoin(
            pts, pdf, res=5
        ).collect()
    }
    assert len(bc) > 20
    assert cj == bc


def test_cusum_finds_planted_level_shift(spark):
    # Key 1: flat 10.0 then flat 50.0 at position 30 -> split_k == 30.
    rows = []
    for i in range(60):
        v = 10.0 if i < 30 else 50.0
        rows.append((i, 1, f"2024-01-01 00:{i:02d}:00", v))
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "value"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = ops_temporal.cusum_changepoint(df).collect()[0]
    assert out.split_k == 30
    assert out.n == 60
    assert out.score > 0


def test_mmr_diversifies_over_pure_relevance(spark):
    # Three near-identical high-rel vectors + one orthogonal
    # medium-rel vector: pure relevance would pick the clones 1-2-3;
    # MMR must pull the orthogonal one in by rank 2.
    rows = [
        (1, 0.99, [10.0, 0.0]),
        (2, 0.98, [10.0, 0.1]),
        (3, 0.97, [10.0, -0.1]),
        (4, 0.60, [0.0, 10.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, rel double, qvec array<double>")
    out = ops_sim.mmr_rerank(df, k=3, lam=0.5)
    got = [r.vec_id for r in out.orderBy("sel_rank").collect()]
    assert got[0] == 1
    assert got[1] == 4
    assert out.count() == 3


def test_mmr_k_larger_than_candidates(spark):
    df = spark.createDataFrame(
        [(1, 0.9, [1.0, 0.0]), (2, 0.8, [0.0, 1.0])],
        "vec_id long, rel double, qvec array<double>",
    )
    out = ops_sim.mmr_rerank(df, k=10)
    assert out.count() == 2
