"""Invariant tests for batch 159: Pielou evenness, Berger-Parker."""

from __future__ import annotations

from pdal_spark.operators.textops import berger_parker, pielou_evenness


def test_pielou_even_is_one(spark):
    rows = [(0, sp) for sp in (1, 2, 3, 4)] * 5
    df = spark.createDataFrame(rows, "p long, sp long")
    r = pielou_evenness(df, "p", "sp").collect()[0]
    assert r["s_richness"] == 4
    assert abs(r["j"] - 1.0) < 5e-3


def test_pielou_skewed_below_one(spark):
    rows = [(0, 1)] * 95 + [(0, 2)] * 5
    df = spark.createDataFrame(rows, "p long, sp long")
    r = pielou_evenness(df, "p", "sp").collect()[0]
    assert r["j"] < 0.35


def test_berger_parker(spark):
    rows = [(0, 1)] * 6 + [(0, 2)] * 3 + [(0, 3)]
    df = spark.createDataFrame(rows, "p long, sp long")
    r = berger_parker(df, "p", "sp").collect()[0]
    assert r["n_max"] == 6 and r["d"] == 0.6
