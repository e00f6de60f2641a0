"""Invariant tests for batch 172: VaR/ES, omega ratio."""

from __future__ import annotations

from pdal_spark.operators.stats import omega_ratio, var_es


def test_var_es_known(spark):
    vals = list(range(-50, 50))  # 100 values
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = var_es(df, "v", pct=5).collect()[0]
    # 5% tail = 5 worst values -50..-46: VaR -46, ES -48
    assert r["k_tail"] == 5 and r["var_q"] == -46
    assert r["es"] == -48.0


def test_omega_symmetric_is_one(spark):
    vals = list(range(-10, 0)) + list(range(1, 11))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = omega_ratio(df, "v", threshold=0).collect()[0]
    assert r["omega"] == 1.0


def test_omega_no_losses_null(spark):
    df = spark.createDataFrame([(v,) for v in range(1, 5)],
                               "v long")
    assert omega_ratio(df, "v", 0).collect()[0]["omega"] is None
