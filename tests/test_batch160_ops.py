"""Invariant tests for batch 160: shift function, sign test."""

from __future__ import annotations

from pdal_spark.operators.stats import shift_function, sign_test


def test_shift_function_pure_shift(spark):
    a = spark.createDataFrame([(v,) for v in range(100)], "v long")
    b = spark.createDataFrame([(v + 7,) for v in range(100)],
                              "v long")
    out = shift_function(a, b, "v").collect()
    assert len(out) == 5
    assert all(r["shift"] == 7 for r in out)


def test_shift_function_tail_only(spark):
    # B matches A except its top decile explodes
    a_vals = list(range(100))
    b_vals = list(range(90)) + [1000 + v for v in range(10)]
    a = spark.createDataFrame([(v,) for v in a_vals], "v long")
    b = spark.createDataFrame([(v,) for v in b_vals], "v long")
    out = {r["p"]: r["shift"] for r in
           shift_function(a, b, "v", pcts=[50, 95]).collect()}
    assert out[50] == 0 and out[95] > 900


def test_sign_test_counts_and_z(spark):
    rows = [(5, 3)] * 12 + [(3, 5)] * 3 + [(4, 4)] * 5
    df = spark.createDataFrame(rows, "xv long, yv long")
    r = sign_test(df, "xv", "yv").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["n_tie"]) == (12, 3, 5)
    # z = (|9| - 1)/sqrt(15)
    assert abs(r["z"] - 8 / 15 ** 0.5) < 1e-12
