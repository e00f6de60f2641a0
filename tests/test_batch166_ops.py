"""Invariant tests for batch 166: NPS, interquartile mean."""

from __future__ import annotations

from pdal_spark.operators.stats import interquartile_mean, nps_score


def test_nps_known_mix(spark):
    rows = [(10,)] * 5 + [(7,)] * 3 + [(2,)] * 2
    df = spark.createDataFrame(rows, "v long")
    r = nps_score(df, "v").collect()[0]
    assert (r["promoters"], r["passives"], r["detractors"]) \
        == (5, 3, 2)
    assert abs(r["nps"] - 0.3) < 1e-12
    assert r["lo"] < 0.3 < r["hi"]


def test_iqm_drops_tails(spark):
    rows = [(0, v) for v in [1, 2, 3, 4, 5, 6, 7, 1000]]
    df = spark.createDataFrame(rows, "k long, v long")
    r = interquartile_mean(df, "k", "v").collect()[0]
    # n=8: keep ranks 3..6 -> values 3,4,5,6 -> mean 4.5
    assert r["n_kept"] == 4 and r["iqm"] == 4.5
