"""Invariant tests for batch 106: isotonic fit, Weibull fit,
Grubbs' statistic."""

from __future__ import annotations

from pdal_spark.operators.stats import (
    ISO_Q,
    grubbs_stat,
    isotonic_fit,
    weibull_fit,
)


def _iso(spark, vals):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "o long, y long"
    )
    rows = isotonic_fit(df, "o", "y").collect()
    return [r["fit_q"] for r in sorted(rows, key=lambda r: r["i"])]


def test_isotonic_monotone_input_is_identity(spark):
    fit = _iso(spark, [1, 2, 3, 4])
    assert fit == [v * ISO_Q for v in [1, 2, 3, 4]]


def test_isotonic_pools_violators(spark):
    # [3, 1] pools to the mean 2,2 ; [1, 5, 3] pools tail to 4,4
    assert _iso(spark, [3, 1]) == [2 * ISO_Q, 2 * ISO_Q]
    assert _iso(spark, [1, 5, 3]) == [ISO_Q, 4 * ISO_Q, 4 * ISO_Q]


def test_isotonic_output_is_monotone(spark):
    fit = _iso(spark, [5, 3, 8, 2, 9, 1, 7])
    assert fit == sorted(fit)


def test_weibull_fit_recovers_shape_direction(spark):
    # exponential-ish data (shape ~ 1): quantized fit lands near 1
    import math

    vals = [max(1, int(round(-50.0 * math.log(1 - (i + 0.5) / 200))))
            for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = weibull_fit(df, "v").collect()[0]
    assert 0.7 < r["shape"] < 1.4
    assert r["scale_r"] is not None and r["scale_r"] > 0


def test_grubbs_flags_planted_outlier(spark):
    base = [(10,)] * 50 + [(11,)] * 50 + [(500,)]
    df = spark.createDataFrame(base, "x long")
    r = grubbs_stat(df, "x").collect()[0]
    assert r["g"] > 9  # massive single outlier
    flat = spark.createDataFrame([(7,)] * 5, "x long")
    assert grubbs_stat(flat, "x").collect()[0]["g"] is None
