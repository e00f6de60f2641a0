"""Batch-11 ops: hll_intersect, trajectory_resample, compaction_plan."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import sketch as ops_sketch
from pdal_spark.operators import temporal as ops_temporal
from pdal_spark.plans import bucketing as ops_bucketing


def test_hll_intersect_tracks_true_overlap(spark):
    # A = 0..599, B = 400..999 -> |A ∩ B| = 200, |A ∪ B| = 1000.
    rows = [("a", i) for i in range(600)]
    rows += [("b", i) for i in range(400, 1000)]
    df = spark.createDataFrame(rows, ["g", "elem"])
    out = ops_sketch.hll_intersect(df, "g", "elem", "a", "b").collect()[0]
    assert out.est_union == pytest.approx(1000, rel=0.35)
    assert out.est_a == pytest.approx(600, rel=0.35)
    # 64 registers -> intersection via inclusion-exclusion is coarse;
    # just pin it is nonnegative and below the smaller set's estimate
    assert 0 <= out.est_intersect <= max(out.est_a, out.est_b)


def test_trajectory_resample_spacing_and_endpoints(spark):
    # One horizontal leg of length 10 with step 3: start vertex + 3
    # interior samples at x=3,6,9; final vertex closes the line.
    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00", 0.0, 0.0),
            (2, 1, "2024-01-01 00:01:00", 0.0, 10.0),
        ],
        ["event_id", "user_id", "ts", "lat", "lon"],
    ).withColumn("ts", F.to_timestamp("ts"))
    out = ops_temporal.trajectory_resample(df, step=3.0).collect()
    xs = sorted(r.sx for r in out)
    assert xs == [0.0, 3.0, 6.0, 9.0, 10.0]
    assert all(r.sy == 0.0 for r in out)


def test_trajectory_resample_caps_teleport_leg(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00", 0.0, -179.0),
            (2, 1, "2024-01-01 00:01:00", 0.0, 179.0),
        ],
        ["event_id", "user_id", "ts", "lat", "lon"],
    ).withColumn("ts", F.to_timestamp("ts"))
    out = ops_temporal.trajectory_resample(
        df, step=0.001, max_points_per_leg=16
    ).collect()
    # capped: 1 start + 16 interior + final vertex
    assert len(out) == 18


def test_compaction_plan_groups_near_target(spark):
    files = spark.createDataFrame(
        [("p", i, 300) for i in range(10)],
        ["partition", "file_id", "size_bytes"],
    )
    out = ops_bucketing.compaction_plan(files, target_bytes=1000)
    sizes = {
        r["group"]: r.total
        for r in out.groupBy("group")
        .agg(F.sum("size_bytes").alias("total"))
        .collect()
    }
    # 10 x 300 into ~1000-byte groups: every full group holds >= 1000
    # bytes of cumulative cut; only the last is smaller
    groups = sorted(sizes)
    assert all(sizes[g] >= 900 for g in groups[:-1])
    assert sum(sizes.values()) == 3000
    # deterministic: rerun produces the identical assignment
    again = ops_bucketing.compaction_plan(files, target_bytes=1000)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )
