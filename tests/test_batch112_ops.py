"""Invariant tests for batch 112: competing risks, ECE."""

from __future__ import annotations

from pdal_spark.operators.stats import ece_score
from pdal_spark.operators.temporal import competing_risks


def test_competing_risks_textbook(spark):
    # t=1: cause-1 death (n=5); t=2: cause-2 death (n=4);
    # t=3: censored; t=4: cause-1 death (n=2); t=5 censored
    rows = [(1, 1), (2, 2), (3, 0), (4, 1), (5, 0)]
    df = spark.createDataFrame(rows, "t long, e int")
    out = {r["t"]: r for r in
           competing_risks(df, "t", "e").collect()}
    # CIF1(1) = 1/5 ; CIF2(2) = S(1)=4/5 * 1/4 = 1/5
    assert abs(out[1]["cif1_r"] - 0.2) < 1e-6
    assert abs(out[2]["cif2_r"] - 0.2) < 1e-6
    # CIF1(4) = 1/5 + S(2-)=4/5*3/4 * 1/2 = 0.2 + 0.3 = 0.5
    assert abs(out[4]["cif1_r"] - 0.5) < 1e-5
    # CIFs never exceed 1 and sum CIF1+CIF2 <= 1
    for r in out.values():
        assert r["cif1_r"] + r["cif2_r"] <= 1.0 + 1e-9


def test_competing_risks_monotone(spark):
    rows = [(i % 7 + 1, (i % 3)) for i in range(60)]
    df = spark.createDataFrame(rows, "t long, e int")
    seq = sorted(competing_risks(df, "t", "e").collect(),
                 key=lambda r: r["t"])
    for a, b in zip(seq, seq[1:]):
        assert b["cif1_r"] >= a["cif1_r"] - 1e-12
        assert b["cif2_r"] >= a["cif2_r"] - 1e-12


def test_ece_perfectly_calibrated_binwise(spark):
    # conf 0.5 (500/1000), half the rows positive -> ECE 0
    rows = [(1, 500), (0, 500), (1, 500), (0, 500)]
    df = spark.createDataFrame(rows, "y long, num long")
    r = ece_score(df, "y", "num", 1000).collect()[0]
    assert r["ece_num"] == 0 and r["ece"] == 0.0


def test_ece_overconfident(spark):
    # conf 0.9 but no positives -> ECE = 0.9
    rows = [(0, 900)] * 10
    df = spark.createDataFrame(rows, "y long, num long")
    r = ece_score(df, "y", "num", 1000).collect()[0]
    assert abs(r["ece"] - 0.9) < 1e-12
