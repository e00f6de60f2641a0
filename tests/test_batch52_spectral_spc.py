"""Batch-52 ops: periodogram, XmR control chart."""

import math

import pytest

from pdal_spark.operators import temporal as ops_temporal


def test_periodogram_finds_planted_frequency(spark):
    # pure cosine at harmonic 2 of a 24-cycle (integerized)
    n = 48
    rows = [(1, t, round(100 * math.cos(2 * math.pi * 2 * t / 24)))
            for t in range(n)]
    df = spark.createDataFrame(rows, ["uid", "o", "v"])
    out = {r.k: r.power for r in ops_temporal.periodogram(
        df, key="uid", order="o", value="v", freqs=[1, 2, 3],
        period_n=24).collect()}
    assert out[2] == max(out.values())
    assert out[2] > 100 * out[1] and out[2] > 100 * out[3]


def test_periodogram_constant_series_zero_power(spark):
    rows = [(1, t, 5) for t in range(24)]
    df = spark.createDataFrame(rows, ["uid", "o", "v"])
    out = {r.k: r.power for r in ops_temporal.periodogram(
        df, key="uid", order="o", value="v", freqs=[1, 2],
        period_n=24).collect()}
    # full cycles of a constant: cos/sin sums cancel
    assert out[1] == pytest.approx(0.0, abs=1e-6)
    assert out[2] == pytest.approx(0.0, abs=1e-6)


def test_xmr_flags_shift(spark):
    vals = [10, 11, 10, 9, 10, 11, 10, 9, 10, 50]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    out = {r.o: r for r in ops_temporal.xmr_chart(
        df, key="k", order="o", value="v").collect()}
    assert out[9].out_of_limits
    assert not out[0].out_of_limits
    # center = mean of all values
    assert out[0].center == pytest.approx(sum(vals) / len(vals))


def test_xmr_steady_process_quiet(spark):
    vals = [10, 11, 10, 9, 10, 11, 10, 9]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    out = ops_temporal.xmr_chart(
        df, key="k", order="o", value="v").collect()
    assert not any(r.out_of_limits for r in out)


def test_xmr_single_observation_drops(spark):
    df = spark.createDataFrame([(1, 0, 5)], ["k", "o", "v"])
    assert ops_temporal.xmr_chart(
        df, key="k", order="o", value="v").count() == 0
