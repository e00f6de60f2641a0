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


def test_usl_known_answer_exact_quadratic(spark):
    """Reference-independent pin (round-2 ADVICE): with exactly three
    points the normal equations are interpolation, so the recovered
    coefficients are hand-computable with no least-squares slack.

    y_q = floor(nn/x * 1024 + 0.5):
        (nn=2, x=4) -> y=0.50 -> y_q=512
        (nn=3, x=2) -> y=1.50 -> y_q=1536
        (nn=5, x=4) -> y=1.25 -> y_q=1280
    Quadratic through (2,512),(3,1536),(5,1280):
        A + Bn + Cn^2 with A=-3840, B=2944, C=-384 (hand-solved),
    so c0=-3840/1024=-3.75, c1=2944/1024=2.875, c2=-384/1024=-0.375.
    """
    df = spark.createDataFrame(
        [(2, 4), (3, 2), (5, 4)], "nn long, x long"
    )
    r = usl_fit(df, "nn", "x").collect()[0]
    assert r["n_pts"] == 3
    assert abs(r["c0"] - (-3.75)) < 1e-9
    assert abs(r["c1"] - 2.875) < 1e-9
    assert abs(r["c2"] - (-0.375)) < 1e-9
