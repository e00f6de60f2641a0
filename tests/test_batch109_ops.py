"""Invariant tests for batch 109: Hurst R/S, Juilland's D,
Gries' DP."""

from __future__ import annotations

from pdal_spark.operators.temporal import hurst_rs
from pdal_spark.operators.textops import gries_dp, juilland_d


def test_hurst_rs_blocks_and_positive(spark):
    vals = [(i, (i * 7919) % 13) for i in range(64)]
    df = spark.createDataFrame(vals, "o long, v long")
    out = {r["m"]: r for r in
           hurst_rs(df, "o", "v", sizes=[8, 32]).collect()}
    assert out[8]["n_blocks"] == 8 and out[32]["n_blocks"] == 2
    # R/S of a varying series is strictly positive and grows with m
    assert 0 < out[8]["mean_rs"] < out[32]["mean_rs"]


def test_hurst_rs_skips_constant_blocks(spark):
    # first 8 rows constant (den=0), rest varying
    vals = [(i, 5) for i in range(8)] + [(8 + i, i % 3)
                                         for i in range(8)]
    df = spark.createDataFrame(vals, "o long, v long")
    out = {r["m"]: r for r in
           hurst_rs(df, "o", "v", sizes=[8]).collect()}
    assert out[8]["n_blocks"] == 1


def _docs(spark):
    # equal-size parts (32 tokens each): w1 evenly spread, w2
    # concentrated in doc 0, filler pads the others
    rows = [(i, "w1 " + ("w2 " * 30 if i == 0 else "pad " * 30)
             + "w1") for i in range(8)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_juilland_d_even_beats_concentrated(spark):
    out = {r["word"]: r for r in juilland_d(
        _docs(spark), n_parts=8, min_freq=10,
    ).collect()}
    assert out["w1"]["d"] > 0.99   # perfectly even
    assert out["w2"]["d"] < 0.1    # one part only


def test_gries_dp_bounds_and_order(spark):
    out = {r["word"]: r for r in gries_dp(
        _docs(spark), n_parts=8, min_freq=10,
    ).collect()}
    assert 0.0 <= out["w1"]["dp"] < 0.2
    assert out["w2"]["dp"] > 0.5
    assert out["w2"]["dp"] <= 1.0
