"""Batch-25 ops: trajectory_progress, spacetime_counts,
suppress_small_cells."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import hexbin as ops_hexbin
from pdal_spark.operators import temporal as ops_temporal


def _track(spark):
    rows = [
        (1, 1, "2024-01-01 00:00:00", 0.0, 0.0),
        (2, 1, "2024-01-01 00:01:00", 0.0, 1.0),
        (3, 1, "2024-01-01 00:02:00", 0.0, 3.0),
    ]
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "lat", "lon"]
    ).withColumn("ts", F.to_timestamp("ts"))


def test_trajectory_progress_monotone_fractions(spark):
    out = {r.event_id: r for r in
           ops_temporal.trajectory_progress(_track(spark)).collect()}
    assert out[1].cum_mm == 0 and out[1].frac_q == 0
    assert out[3].cum_mm == out[3].total_mm
    assert out[3].frac_q == 1 << 20
    # leg 2 is 1/3 of the path
    assert abs(out[2].frac_q - (1 << 20) // 3) <= 1


def test_spacetime_counts_splits_by_day(spark):
    rows = [
        (1, 1, "2024-01-01 00:00:00", 0.0, 0.0),
        (2, 1, "2024-01-01 23:00:00", 0.0, 0.0),
        (3, 1, "2024-01-02 01:00:00", 0.0, 0.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "lat", "lon"]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = ops_hexbin.spacetime_counts(df, res=5, bucket_s=86400)
    got = sorted((r.t_bucket, r.n) for r in out.collect())
    assert [n for _, n in got] == [2, 1]


def test_small_cells_suppressed(spark):
    rows = []
    # cell A: 3 distinct users -> released
    for u in range(3):
        rows.append((len(rows), u, 10.0, 10.0))
    # cell B: 1 user with many points -> suppressed
    for i in range(5):
        rows.append((len(rows), 99, 50.0, 50.0))
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "lat", "lon"]
    )
    out = ops_hexbin.suppress_small_cells(df, res=6, k=3).collect()
    assert len(out) == 1
    assert out[0].n_entities == 3 and out[0].n_points == 3
