"""Batch-23 ops: psi_drift, haar_downsample."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal


def test_psi_zero_for_identical_large_for_shifted(spark):
    a = spark.range(2000).selectExpr(
        "cast(id % 100 as double) AS value"
    )
    same = ops_stats.psi_drift(a, a, "value", 0.0, 100.0).collect()
    psi_same = sum(r.contrib for r in same)
    assert psi_same == pytest.approx(0.0, abs=1e-12)

    b = spark.range(2000).selectExpr(
        "cast(50 + id % 50 as double) AS value"  # mass shifted up
    )
    shifted = ops_stats.psi_drift(a, b, "value", 0.0, 100.0).collect()
    psi_shift = sum(r.contrib for r in shifted)
    assert psi_shift > 0.25  # "investigate" territory


def test_haar_reconstruction_identities(spark):
    rows = [
        (1, 1, "2024-01-01 00:00:00", 4.0),
        (2, 1, "2024-01-01 00:01:00", 2.0),
        (3, 1, "2024-01-01 00:02:00", 10.0),  # odd tail
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "value"]
    ).withColumn("ts", F.to_timestamp("ts"))
    q = ops_temporal.HAAR_Q
    out = {r.pair: r for r in
           ops_temporal.haar_downsample(df).collect()}
    # pair 0: a=4, b=2 -> approx2 = 6q, detail2 = 2q;
    # a = (approx2+detail2)/2, b = (approx2-detail2)/2 reconstruct
    assert out[0].approx2_q == 6 * q
    assert out[0].detail2_q == 2 * q
    assert (out[0].approx2_q + out[0].detail2_q) // 2 == 4 * q
    # odd tail: approx2 = 2*value, detail 0
    assert out[1].n == 1
    assert out[1].approx2_q == 2 * 10 * q
    assert out[1].detail2_q == 0
