"""Invariant tests for batch 183: crest factor, energy flatness."""

from __future__ import annotations

from pdal_spark.operators.multimodal import (
    crest_factor,
    energy_flatness,
)


def test_crest_square_wave_is_one(spark):
    rows = [(0, v) for v in ([5, -5] * 10)]
    df = spark.createDataFrame(rows, "k long, v long")
    r = crest_factor(df, "k", "v").collect()[0]
    assert abs(r["crest"] - 1.0) < 1e-12


def test_crest_spiky_high(spark):
    rows = [(0, 1)] * 99 + [(0, 100)]
    df = spark.createDataFrame(rows, "k long, v long")
    r = crest_factor(df, "k", "v").collect()[0]
    assert r["crest"] > 9


def test_energy_flatness_steady_vs_bursty(spark):
    steady = [(0, i, 4 if i % 2 == 0 else -4)
              for i in range(256)]
    bursty = [(1, i, (100 if i < 64 else 1)
               * (1 if i % 2 == 0 else -1))
              for i in range(256)]
    df = spark.createDataFrame(steady + bursty,
                               "k long, o long, v long")
    out = {r["k"]: r["flat_r"] for r in energy_flatness(
        df, "k", "o", "v", frame=64).collect()}
    assert abs(out[0] - 1.0) < 1e-3   # 2^-10 ln-grid dust
    assert out[1] < 0.2               # one loud frame among quiet
