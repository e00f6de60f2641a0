"""Invariant tests for batch 182: Geweke z, split R-hat."""

from __future__ import annotations

from pdal_spark.operators.temporal import geweke_z, split_rhat


def _series(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "o long, v long"
    )


def test_geweke_stationary_small_drifting_large(spark):
    flat = [(i * 2654435761 % 2 ** 31) % 20 for i in range(200)]
    drift = [v + (10 if i >= 100 else 0)
             for i, v in enumerate(flat)]
    z1 = geweke_z(_series(spark, flat), "o", "v").collect()[0]["z"]
    z2 = geweke_z(_series(spark, drift), "o",
                  "v").collect()[0]["z"]
    assert abs(z1) < 3
    assert abs(z2) > 5


def test_split_rhat_stationary_near_one(spark):
    flat = [(i * 2654435761 % 2 ** 31) % 20 for i in range(200)]
    r = split_rhat(_series(spark, flat), "o", "v").collect()[0]
    assert abs(r["rhat"] - 1.0) < 0.05
    shifted = [v + (50 if i >= 100 else 0)
               for i, v in enumerate(flat)]
    r2 = split_rhat(_series(spark, shifted), "o",
                    "v").collect()[0]
    assert r2["rhat"] > 2
