"""Invariant tests for batch 151: two-way ANOVA, Dixon Q."""

from __future__ import annotations

import pytest

from pdal_spark.operators.stats import dixon_q, two_way_anova


def test_two_way_anova_planted_main_effects(spark):
    # additive effects, no interaction, tiny within-noise
    rows = []
    for a in range(2):
        for b in range(3):
            for r in range(4):
                rows.append((a, b, 100 + a * 50 + b * 10
                             + (r % 2)))
    df = spark.createDataFrame(rows, "fa long, fb long, v long")
    r = two_way_anova(df, "fa", "fb", "v").collect()[0]
    assert r["a_levels"] == 2 and r["b_levels"] == 3
    assert r["f_a"] > 100 and r["f_b"] > 100
    # no planted interaction: F_ab tiny relative to the mains
    assert r["f_ab"] < r["f_a"] / 100


def test_two_way_anova_unbalanced_raises(spark):
    rows = [(0, 0, 1), (0, 0, 2), (0, 1, 3), (1, 0, 4),
            (1, 1, 5), (1, 1, 6)]
    df = spark.createDataFrame(rows, "fa long, fb long, v long")
    with pytest.raises(ValueError):
        two_way_anova(df, "fa", "fb", "v")


def test_dixon_q_flags_high_outlier(spark):
    vals = [10, 11, 12, 13, 14, 50]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = dixon_q(df, "v").collect()[0]
    assert r["gap_high"] == 36 and r["range"] == 40
    assert abs(r["q_high"] - 0.9) < 1e-12
    assert abs(r["q_low"] - 1 / 40) < 1e-12
