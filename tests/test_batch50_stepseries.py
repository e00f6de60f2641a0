"""Batch-50 ops: time-weighted average, state durations."""

import pytest

from pdal_spark.operators import temporal as ops_temporal


def _ts(spark, rows, cols):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, cols)
    return df.withColumn(
        "tsu", F.timestamp_micros(F.col("t_us"))
    )


def test_twa_weights_by_hold_time(spark):
    # v=10 held 1s, v=0 held 9s -> twa = 1.0
    rows = [(1, 0, 10), (1, 1_000_000, 0), (1, 10_000_000, 99)]
    df = _ts(spark, rows, ["k", "t_us", "v"])
    r = ops_temporal.time_weighted_avg(
        df, key="k", ts="tsu", value="v").collect()[0]
    assert r.twa == pytest.approx(1.0)
    assert r.span_us == 10_000_000


def test_twa_constant_value(spark):
    rows = [(1, i * 1_000_000, 7) for i in range(5)]
    df = _ts(spark, rows, ["k", "t_us", "v"])
    r = ops_temporal.time_weighted_avg(
        df, key="k", ts="tsu", value="v").collect()[0]
    assert r.twa == pytest.approx(7.0)


def test_twa_single_observation_drops(spark):
    df = _ts(spark, [(1, 0, 5)], ["k", "t_us", "v"])
    assert ops_temporal.time_weighted_avg(
        df, key="k", ts="tsu", value="v").count() == 0


def test_state_durations_shares(spark):
    rows = [(1, 0, "up"), (1, 3_000_000, "down"),
            (1, 4_000_000, "up"), (1, 10_000_000, "down")]
    df = _ts(spark, rows, ["k", "t_us", "s"])
    out = {r.s: r for r in ops_temporal.state_durations(
        df, key="k", ts="tsu", state="s").collect()}
    # up: [0,3) + [4,10) = 9s of 10; down: [3,4) = 1s; final open
    assert out["up"].share == pytest.approx(0.9)
    assert out["down"].share == pytest.approx(0.1)
    assert out["up"].n_holds == 2 and out["down"].n_holds == 1
