"""Invariant tests for batch 118: matrix profile, binseg split."""

from __future__ import annotations

from pdal_spark.operators.temporal import binseg_split, matrix_profile


def test_matrix_profile_finds_planted_motif(spark):
    # a distinctive motif planted twice in noise-ish filler
    motif = [9, 1, 8, 2]
    series = [5, 3, 6] + motif + [7, 4, 5, 6, 3] + motif + [6, 5]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(series)], "o long, v long"
    )
    out = {r["i"]: r for r in
           matrix_profile(df, "o", "v", w=4).collect()}
    m1, m2 = 4, 13  # 1-based subsequence starts of the two motifs
    assert out[m1]["mp_d2"] == 0 and out[m1]["mp_j"] == m2
    assert out[m2]["mp_d2"] == 0 and out[m2]["mp_j"] == m1
    # exclusion zone: no self/trivial matches
    assert all(abs(r["mp_j"] - r["i"]) >= 4 for r in out.values())


def test_binseg_split_finds_level_shift(spark):
    series = [10] * 30 + [50] * 20
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(series)], "o long, v long"
    )
    r = binseg_split(df, "o", "v").collect()[0]
    assert r["t_star"] == 30
    assert r["mean_l"] == 10.0 and r["mean_r"] == 50.0
    assert r["cost_q"] == 0  # both segments constant


def test_binseg_split_tie_prefers_smallest_t(spark):
    df = spark.createDataFrame(
        [(i, 7) for i in range(10)], "o long, v long"
    )
    r = binseg_split(df, "o", "v").collect()[0]
    assert r["t_star"] == 1 and r["cost_q"] == 0
