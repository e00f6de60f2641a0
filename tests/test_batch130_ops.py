"""Invariant tests for batch 130: Ruzicka and sparse cosine
joins."""

from __future__ import annotations

import math

from pdal_spark.operators.similarity import (
    RUZ_Q,
    ruzicka_join,
    sparse_cosine_join,
)


def _prof(spark, rows):
    return spark.createDataFrame(rows, "e long, d long, w long")


def test_ruzicka_exact_values(spark):
    rows = [(1, 10, 4), (1, 11, 2), (2, 10, 2), (2, 12, 6)]
    df = _prof(spark, rows)
    out = ruzicka_join(df, "e", "d", "w").collect()
    assert len(out) == 1
    r = out[0]
    # min over shared d=10: 2; max-sum = 6 + 8 - 2 = 12
    assert r["sum_min"] == 2 and r["sum_max"] == 12
    assert r["sim_q"] == (2 * RUZ_Q) // 12


def test_ruzicka_identical_profiles_are_one(spark):
    rows = [(1, 5, 3), (1, 6, 7), (2, 5, 3), (2, 6, 7)]
    r = ruzicka_join(_prof(spark, rows), "e", "d", "w").collect()[0]
    assert r["sim_q"] == RUZ_Q


def test_sparse_cosine_matches_direct(spark):
    rows = [(1, 0, 1), (1, 1, 2), (2, 0, 2), (2, 1, 1)]
    r = sparse_cosine_join(_prof(spark, rows), "e", "d",
                           "w").collect()[0]
    want = 4 / math.sqrt(5 * 5)
    assert abs(r["cos_q"] / 1e6 - want) < 2e-6
    assert r["dot"] == 4 and r["na2"] == 5


def test_sparse_cosine_no_shared_dim_not_generated(spark):
    rows = [(1, 0, 5), (2, 1, 5)]
    assert sparse_cosine_join(_prof(spark, rows), "e", "d",
                              "w").count() == 0
