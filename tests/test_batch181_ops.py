"""Invariant tests for batch 181: autocorrelation time / ESS."""

from __future__ import annotations

from pdal_spark.operators.temporal import autocorr_time


def _series(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "o long, v long"
    )


def test_tau_iid_near_one(spark):
    # hash-scrambled values (a plain (i*k) % m lattice is ANTI-
    # correlated and drives tau toward 0)
    vals = [((i * 2654435761) % (2 ** 31)) % 97
            for i in range(400)]
    r = autocorr_time(_series(spark, vals), "o", "v").collect()[0]
    assert 0.3 < r["tau"] < 1.8
    assert r["ess"] > 200


def test_tau_sticky_series_large(spark):
    # long runs of repeated values -> high autocorrelation
    vals = []
    for b in range(40):
        vals += [(b * 13) % 50] * 10
    r = autocorr_time(_series(spark, vals), "o", "v").collect()[0]
    assert r["tau"] > 5
    assert r["ess"] < len(vals) / 4
