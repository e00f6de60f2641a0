"""Invariant tests for batch 186: association-rule metrics."""

from __future__ import annotations

from pdal_spark.operators.textops import rule_metrics


def test_rule_metrics_known(spark):
    # 10 baskets; item 1 in all; item 2 in baskets 0-4 (with 1)
    rows = [(b, 1) for b in range(10)] + [(b, 2) for b in range(5)]
    df = spark.createDataFrame(rows, "bk long, it long")
    out = {(r["a"], r["b"]): r for r in rule_metrics(
        df, "bk", "it", min_pair=1).collect()}
    r12 = out[(1, 2)]
    assert r12["confidence"] == 0.5 and r12["lift"] == 1.0
    assert abs(r12["leverage"]) < 1e-12
    r21 = out[(2, 1)]
    assert r21["confidence"] == 1.0
    assert r21["conviction"] is None  # perfect rule


def test_rule_metrics_positive_association(spark):
    # a and b co-occur always; c independent-ish
    rows = []
    for b in range(10):
        rows += [(b, 1), (b, 2)]
    rows += [(b, 3) for b in range(5)]
    df = spark.createDataFrame(rows, "bk long, it long")
    out = {(r["a"], r["b"]): r for r in rule_metrics(
        df, "bk", "it", min_pair=1).collect()}
    assert out[(1, 2)]["lift"] == 1.0  # both everywhere
    # rules into 3 have lift 1 as well by construction; co-pairs
    # with min support exist
    assert (3, 1) in out and out[(3, 1)]["confidence"] == 1.0
