"""Invariant tests for batch 163: growth accounting, engagement
histogram."""

from __future__ import annotations

from pdal_spark.operators.temporal import (
    engagement_histogram,
    growth_accounting,
)


def test_growth_accounting_classification(spark):
    # u1: p0,p1,p2 (retained twice); u2: p0 then gone (churned at
    # p1); u3: p0, absent p1, back at p2 (resurrected)
    rows = [(1, 0), (1, 1), (1, 2), (2, 0), (3, 0), (3, 2)]
    df = spark.createDataFrame(rows, "u long, p long")
    out = {r["p"]: r for r in
           growth_accounting(df, "u", "p").collect()}
    assert out[0]["n_new"] == 3
    assert out[1]["n_retained"] == 1 and out[1]["n_churned"] == 2
    assert out[2]["n_resurrected"] == 1
    assert out[2]["n_retained"] == 1
    # period 3: the two users active at p2 (u1, u3) churn
    assert out[3]["n_churned"] == 2


def test_engagement_histogram(spark):
    rows = [(1, 0), (1, 1), (1, 2), (2, 0), (3, 0), (3, 1)]
    df = spark.createDataFrame(rows, "u long, p long")
    out = {r["k_active"]: r for r in
           engagement_histogram(df, "u", "p").collect()}
    assert out[3]["n_users"] == 1
    assert out[1]["n_users"] == 1 and out[2]["n_users"] == 1
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-12
