"""Invariant tests for batch 156: Poisson funnel, geometric
stats."""

from __future__ import annotations

import math

from pdal_spark.operators.stats import geometric_stats, poisson_funnel


def test_poisson_funnel_flags_hot_entity(spark):
    rows = []
    for e in range(9):
        rows += [(e, 1, 10)] * 10      # rate 0.1
    rows += [(9, 8, 10)] * 10          # rate 0.8
    df = spark.createDataFrame(rows, "e long, o long, t long")
    out = {r["e"]: r for r in poisson_funnel(
        df, "e", "o", "t").collect()}
    assert out[9]["flag"] == 1
    assert sum(r["flag"] for r in out.values()) <= 2


def test_geometric_stats_known(spark):
    # values 1, 10, 100 -> gm = 10
    rows = [(0, 1), (0, 10), (0, 100)]
    df = spark.createDataFrame(rows, "k long, v long")
    r = geometric_stats(df, "k", "v").collect()[0]
    assert abs(r["gm_r"] - 10.0) < 0.05
    # gsd = exp(sd of ln) = exp(ln 10) = 10
    assert abs(r["gsd_r"] - 10.0) < 0.1


def test_geometric_stats_drops_sub_one(spark):
    rows = [(0, 0), (0, 4), (0, 4)]
    df = spark.createDataFrame(rows, "k long, v long")
    r = geometric_stats(df, "k", "v").collect()[0]
    assert r["n"] == 2 and r["n_dropped"] == 1
    assert abs(r["gm_r"] - 4.0) < 0.02
