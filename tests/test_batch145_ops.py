"""Invariant tests for batch 145: double mass, flow duration."""

from __future__ import annotations

from pdal_spark.operators.temporal import double_mass, flow_duration


def test_double_mass_proportional_is_zero(spark):
    rows = [(i, 3, 6) for i in range(20)]
    df = spark.createDataFrame(rows, "o long, x long, r long")
    r = double_mass(df, "o", "x", "r").collect()[0]
    assert r["max_abs_dev"] == 0 and r["t_star"] == 1


def test_double_mass_break_located(spark):
    # station under-reads by half after t=10
    rows = [(i, 10 if i < 10 else 5, 10) for i in range(20)]
    df = spark.createDataFrame(rows, "o long, x long, r long")
    r = double_mass(df, "o", "x", "r").collect()[0]
    # deviation |cx*sr - cr*sx| peaks exactly at the break
    assert r["t_star"] == 10


def test_flow_duration_order_stats(spark):
    vals = list(range(1, 101))  # 1..100
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = {r["p"]: r for r in flow_duration(
        df, "v", exceed_pcts=[5, 50, 95]).collect()}
    # desc rank 5 -> value 96; rank 50 -> 51; rank 95 -> 6
    assert out[5]["q_value"] == 96
    assert out[50]["q_value"] == 51
    assert out[95]["q_value"] == 6
    assert out[5]["q_value"] > out[50]["q_value"] > \
        out[95]["q_value"]
