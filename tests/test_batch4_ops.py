"""Batch-4 ops: grid_disk, trajectory_stats, convex hull."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import features as ops_features
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import temporal as ops_temporal


def test_grid_disk_ring_counts_and_wrap(spark):
    # One interior cell at res 4: full (2k+1)^2 disk with ring sizes
    # 1 / 8 / 16.
    df = spark.createDataFrame([(0.0, 0.0)], ["lat", "lon"])
    cells = ops_h3.h3_encode(df, "lat", "lon", res=4)
    disk = ops_h3.grid_disk(cells, "h3_cell", res=4, k=2)
    by_ring = {
        r.ring: r.cnt
        for r in disk.groupBy("ring").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    assert by_ring == {0: 1, 1: 8, 2: 16}
    assert disk.select("disk_cell").distinct().count() == 25

    # Antimeridian cell: longitude wraps (full disk, all distinct);
    # polar cell: rows past the pole drop.
    am = ops_h3.h3_encode(
        spark.createDataFrame([(0.0, -179.999)], ["lat", "lon"]),
        "lat", "lon", res=4,
    )
    d_am = ops_h3.grid_disk(am, "h3_cell", res=4, k=1)
    assert d_am.count() == 9
    assert d_am.select("disk_cell").distinct().count() == 9

    pole = ops_h3.h3_encode(
        spark.createDataFrame([(89.9, 0.0)], ["lat", "lon"]),
        "lat", "lon", res=4,
    )
    assert ops_h3.grid_disk(pole, "h3_cell", res=4, k=1).count() == 6


def test_trajectory_stats_straightline_and_loop(spark):
    # Key 1 moves monotonically east along the equator: straightness
    # == 1.0 (net == path). Key 2 goes out and back: net ~ 0.
    rows = []
    for i in range(5):
        rows.append((i, 1, f"2024-01-01 00:0{i}:00", 0.0, float(i)))
    for i, lon in enumerate([0.0, 1.0, 2.0, 1.0, 0.0]):
        rows.append((10 + i, 2, f"2024-01-01 00:0{i}:00", 0.0, lon))
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "lat", "lon"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.user_id: r
        for r in ops_temporal.trajectory_stats(df).collect()
    }
    q = 1 << 20
    assert out[1].n_points == 5
    # quantize-then-sum vs quantize-once differ by <= 1mm per leg
    assert abs(out[1].net_mm - out[1].path_mm) <= 4
    assert out[1].straightness_q >= q - 5
    assert out[2].net_mm == 0
    assert out[2].straightness_q == 0
    assert out[2].path_mm > 4 * out[1].path_mm // 5


def test_trajectory_single_point_key(spark):
    df = spark.createDataFrame(
        [(1, 7, "2024-01-01 00:00:00", 10.0, 20.0)],
        ["event_id", "user_id", "ts", "lat", "lon"],
    ).withColumn("ts", F.to_timestamp("ts"))
    row = ops_temporal.trajectory_stats(df).collect()[0]
    assert row.n_points == 1
    assert row.path_mm == 0
    assert row.net_mm == 0
    assert row.straightness_q is None


def test_convex_hull_known_square(spark):
    # 4 corners + interior points: hull = the 4 corners.
    pts = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0),
           (5.0, 5.0), (2.0, 7.0), (9.0, 1.0)]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    got = {
        (r.qx, r.qy)
        for r in ops_features.convex_hull_exact(df, quant=1).collect()
    }
    assert got == {(0, 0), (10, 0), (0, 10), (10, 10)}


def test_convex_hull_chain_equals_exact(spark):
    # Deterministic scatter, multiple partitions: the distributed
    # monotone-chain path returns the identical vertex set.
    n = 400
    df = (
        spark.range(n)
        .repartition(8)
        .selectExpr(
            "cast(((id * 48271) % 1000) as double) / 7.0 as lon",
            "cast(((id * 69621) % 997) as double) / 9.0 as lat",
        )
    )
    exact = {
        (r.qx, r.qy)
        for r in ops_features.convex_hull_exact(df).collect()
    }
    chain = {
        (r.qx, r.qy) for r in ops_features.convex_hull(df).collect()
    }
    assert len(exact) >= 6
    assert chain == exact


def test_convex_hull_exact_degenerate_inputs(spark):
    # <3 distinct quantized points: exact must match convex_hull by
    # returning the distinct points themselves (ADVICE r1)
    from pdal_spark.operators import features as ops_features

    for pts in ([(0.0, 0.0)], [(0.0, 0.0), (3.0, 4.0)],
                [(0.0, 0.0), (0.0, 0.0), (3.0, 4.0)]):
        df = spark.createDataFrame(pts, ["lon", "lat"])
        exact = sorted(
            (r.qx, r.qy)
            for r in ops_features.convex_hull_exact(df).collect()
        )
        loose = sorted(
            (r.qx, r.qy)
            for r in ops_features.convex_hull(df).collect()
        )
        assert exact == loose
        assert len(exact) == len({tuple(p) for p in pts})
