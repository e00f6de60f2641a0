"""Invariant tests for batch 181: autocorrelation time / ESS."""

from __future__ import annotations

from pdal_spark.operators.temporal import autocorr_time


def _series(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "o long, v long"
    )


def test_tau_matches_direct_formula(spark):
    vals = [((i * 2654435761) % (2 ** 31)) % 97
            for i in range(400)]
    r = autocorr_time(_series(spark, vals), "o", "v").collect()[0]
    n, sm = len(vals), sum(vals)
    d = [n * v - sm for v in vals]
    c0 = sum(x * x for x in d)
    want = 1.0 + 2.0 * sum(
        sum(d[i] * d[i - k] for i in range(k, n)) / c0
        for k in range(1, 6)
    )
    assert abs(r["tau"] - want) < 1e-9
    assert abs(r["ess"] - n / want) < 1e-6


def test_tau_sticky_series_large(spark):
    # long runs of repeated values -> high autocorrelation
    vals = []
    for b in range(40):
        vals += [(b * 13) % 50] * 10
    r = autocorr_time(_series(spark, vals), "o", "v").collect()[0]
    assert r["tau"] > 5
    assert r["ess"] < len(vals) / 4
