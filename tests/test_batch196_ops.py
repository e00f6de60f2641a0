"""Invariant tests for batch 196: Apdex, USL fit."""

from __future__ import annotations

from pdal_spark.operators.stats import apdex, usl_fit


def test_apdex_known_mix(spark):
    rows = [(0, 50)] * 6 + [(0, 150)] * 2 + [(0, 900)] * 2
    df = spark.createDataFrame(rows, "k long, l long")
    r = apdex(df, "k", "l", t_ms=100).collect()[0]
    # (6 + 2/2)/10 = 0.7
    assert abs(r["apdex"] - 0.7) < 1e-12


def test_usl_recovers_linear_scaling(spark):
    # perfect linear scaling X = 10N -> N/X = 0.1 constant ->
    # c0 ~ 0.1, c1 ~ 0, c2 ~ 0
    rows = [(n, 10 * n) for n in range(1, 30)]
    df = spark.createDataFrame(rows, "nn long, x long")
    r = usl_fit(df, "nn", "x").collect()[0]
    assert abs(r["c0"] - 0.1) < 0.01
    assert abs(r["c1"]) < 1e-3 and abs(r["c2"]) < 1e-4


def test_usl_detects_contention(spark):
    # planted USL with sigma=0.1, kappa=0: X = 100N/(1+0.1(N-1))
    rows = [(n, int(round(100 * n / (1 + 0.1 * (n - 1)))))
            for n in range(1, 40)]
    df = spark.createDataFrame(rows, "nn long, x long")
    r = usl_fit(df, "nn", "x").collect()[0]
    # N/X = (0.9 + 0.1N)/100 -> c0 ~ 0.009, c1 ~ 0.001, c2 ~ 0
    assert abs(r["c0"] - 0.009) < 0.002
    assert abs(r["c1"] - 0.001) < 0.0005
    assert abs(r["c2"]) < 1e-4
