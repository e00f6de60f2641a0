"""Batch-62 ops: randomized response, Heaps' law."""

import math

import pytest

from pdal_spark.operators import textops as ops_text

Q = ops_text.RR_Q


def test_rr_recovers_true_prevalence(spark):
    # yes-rate 0.4 under p = 0.75 -> pi = (0.4 + 0.75 - 1)/0.5 = 0.3
    rows = [(1,)] * 40 + [(0,)] * 60
    df = spark.createDataFrame(rows, ["answer"])
    r = ops_text.randomized_response_estimate(
        df, p_honest_q=(3 * Q) // 4).collect()[0]
    assert r.pi_hat == pytest.approx(0.3, abs=1e-9)
    assert r.var_hat > 0


def test_rr_honest_protocol_is_identity(spark):
    rows = [(1,)] * 30 + [(0,)] * 70
    df = spark.createDataFrame(rows, ["answer"])
    r = ops_text.randomized_response_estimate(
        df, p_honest_q=Q).collect()[0]  # p = 1
    assert r.pi_hat == pytest.approx(0.3, abs=1e-9)


def test_heaps_recovers_sqrt_growth(spark):
    rows = []
    for d in range(1, 257):
        for w in range(int(3 * math.sqrt(d))):
            rows.append((d, f"w{w}"))
    df = spark.createDataFrame(rows, ["doc_id", "word"])
    r = ops_text.heaps_law(df).collect()[0]
    assert r.beta == pytest.approx(0.5, abs=0.05)
    assert r.ln_k == pytest.approx(math.log(3), abs=0.15)


def test_heaps_linear_growth_beta_one(spark):
    rows = [(d, f"unique{d}word{j}") for d in range(1, 257)
            for j in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "word"])
    r = ops_text.heaps_law(df).collect()[0]
    assert r.beta == pytest.approx(1.0, abs=0.02)
