"""Batch-56 op: empirical-Bayes rate shrinkage."""

import pytest

from pdal_spark.operators import stats as ops_stats


def _rates(spark, triples):
    rows = [(k, x, n) for k, x, n in triples]
    return spark.createDataFrame(rows, ["k", "hits", "trials"])


def test_eb_small_sample_shrinks_toward_prior(spark):
    # many stable ~30% domains plus one 2/2 outlier: the outlier's
    # shrunk estimate must fall far below its raw 1.0 and the big
    # high-rate domain must outrank it
    triples = [(i, 30 + i % 5, 100) for i in range(20)]
    triples.append((100, 2, 2))       # tiny perfect-looking domain
    triples.append((101, 90, 100))    # genuinely strong domain
    out = {r.k: r for r in ops_stats.empirical_bayes_rates(
        _rates(spark, triples), "k", "hits", "trials").collect()}
    assert out[100].shrunk < 0.9
    assert out[101].shrunk > out[100].shrunk
    # big samples barely move
    assert abs(out[0].shrunk - 0.30) < 0.05


def test_eb_ordering_flips_vs_raw(spark):
    triples = [(i, 20, 100) for i in range(15)]
    triples.append((100, 1, 1))    # raw 1.0
    triples.append((101, 60, 100))  # raw 0.6
    out = {r.k: r for r in ops_stats.empirical_bayes_rates(
        _rates(spark, triples), "k", "hits", "trials").collect()}
    # raw ranks 100 first; shrunk ranks 101 first
    assert out[100].p_q > out[101].p_q
    assert out[101].shrunk > out[100].shrunk


def test_eb_degenerate_prior_falls_back_to_raw(spark):
    triples = [(1, 5, 10), (2, 5, 10)]  # zero variance in rates
    out = {r.k: r for r in ops_stats.empirical_bayes_rates(
        _rates(spark, triples), "k", "hits", "trials").collect()}
    assert out[1].alpha is None
    assert out[1].shrunk == pytest.approx(0.5)
