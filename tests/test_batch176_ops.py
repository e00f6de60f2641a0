"""Invariant tests for batch 176: energy distance, CvM."""

from __future__ import annotations

from pdal_spark.operators.stats import cramer_von_mises, energy_distance


def _s(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v long")


def test_energy_distance_identical_zero(spark):
    a = _s(spark, [1, 5, 9, 12])
    r = energy_distance(a, _s(spark, [1, 5, 9, 12]),
                        "v").collect()[0]
    assert abs(r["e_dist"]) < 1e-12


def test_energy_distance_separated_positive(spark):
    a = _s(spark, list(range(10)))
    b = _s(spark, [v + 100 for v in range(10)])
    r = energy_distance(a, b, "v").collect()[0]
    assert r["e_dist"] > 150


def test_cvm_direct_small_case(spark):
    xa, xb = [1, 3], [2, 4]
    # combined ranks: x:1->1, 3->3; y:2->2, 4->4
    # U = n*((1-1)^2+(3-2)^2) + m*((2-1)^2+(4-2)^2) = 2*1+2*5=12
    # T = 12/(2*2*4) - (16-1)/(6*4) = 0.75 - 0.625 = 0.125
    r = cramer_von_mises(_s(spark, xa), _s(spark, xb),
                         "v").collect()[0]
    assert abs(r["t_stat"] - 0.125) < 1e-12


def test_cvm_separated_larger_than_mixed(spark):
    mixed = cramer_von_mises(
        _s(spark, list(range(0, 40, 2))),
        _s(spark, list(range(1, 41, 2))), "v"
    ).collect()[0]["t_stat"]
    apart = cramer_von_mises(
        _s(spark, list(range(20))),
        _s(spark, [v + 50 for v in range(20)]), "v"
    ).collect()[0]["t_stat"]
    assert apart > 10 * max(mixed, 1e-9)
