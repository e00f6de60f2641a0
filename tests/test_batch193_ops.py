"""Invariant tests for batch 193: interaction contrast, cap
sensitivity."""

from __future__ import annotations

from pdal_spark.operators.stats import (
    cap_sensitivity,
    interaction_contrast,
)


def test_interaction_detected(spark):
    # treatment works ONLY in segment 1
    rows = []
    for s in (0, 1):
        for g in (0, 1):
            n_pos = 50 if (s == 1 and g == 1) else 10
            rows += [(s, g, 1)] * n_pos + [(s, g, 0)] * (100 - n_pos)
    df = spark.createDataFrame(rows, "s long, g long, y long")
    r = interaction_contrast(df, "s", "g", "y").collect()[0]
    assert abs(r["d_a"]) < 1e-12          # segment 0: no effect
    assert abs(r["d_b"] - 0.4) < 1e-12    # segment 1: +40pp
    assert r["z"] < -5                    # strong interaction


def test_cap_sensitivity_monotone(spark):
    vals = list(range(500))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = sorted(cap_sensitivity(df, "v",
                                 caps=[100, 400]).collect(),
                 key=lambda r: r["cap"])
    assert out[0]["capped_mean"] < out[1]["capped_mean"]
    assert out[0]["n_capped"] == 399
    assert abs(out[1]["capped_share"] - 99 / 500) < 1e-12
