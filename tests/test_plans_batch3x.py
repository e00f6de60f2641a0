"""Physical-plan pins for the round-2 session-5 join operators:
broadcast where a small dimension exists, never an unhinted
CartesianProduct on the big side."""

from pyspark.sql import functions as F

from pdal_spark.operators import features as ops_features
from pdal_spark.operators import pointpattern as ops_pp


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _pts(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("oid"),
        (F.col("id") % 300).cast("long").alias("mx"),
        (F.col("id") % 170).cast("long").alias("my"),
    )


def _fac(spark, n=7):
    return spark.range(n).select(
        F.col("id").alias("fid"),
        (F.col("id") * 40).cast("long").alias("mx"),
        (F.col("id") * 20).cast("long").alias("my"),
        (F.col("id") % 5 + 1).alias("w"),
    )


def test_huff_broadcasts_facilities(spark):
    out = ops_pp.huff_model(_pts(spark), _fac(spark))
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" in plan or \
        "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_two_sfca_broadcasts_supply_both_joins(spark):
    demand = _pts(spark).withColumnRenamed("oid", "did") \
        .withColumn("pop", F.lit(2))
    supply = _fac(spark).withColumnRenamed("fid", "sid") \
        .withColumnRenamed("w", "cap")
    out = ops_pp.two_sfca(demand, supply, radius=100)
    plan = _plan(out)
    assert plan.count("BroadcastNestedLoopJoin") >= 1
    assert "CartesianProduct" not in plan


def test_gwr_broadcasts_targets(spark):
    samples = _pts(spark).select(
        "mx", "my",
        (F.col("oid") % 9).alias("x"),
        (F.col("oid") % 11).alias("y"),
    )
    targets = _fac(spark).select(
        F.col("fid").alias("tid"), "mx", "my"
    )
    out = ops_pp.gwr_local(samples, targets, h=50)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_ransac_broadcasts_candidates(spark):
    pts = _pts(spark).select(
        F.col("oid").alias("pid"), "mx", "my"
    )
    out = ops_features.ransac_line(pts, n_cand=4, buckets=8)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_spacetime_scan_joins_are_hash_joins(spark):
    counts = spark.range(300).select(
        F.lit(72057594172145664).alias("cell"),
        (F.col("id") % 5).alias("tbin"),
        F.lit(1).alias("n"),
    )
    out = ops_pp.spacetime_scan(counts, res=4, max_k=1)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
