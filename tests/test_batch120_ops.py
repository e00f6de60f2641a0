"""Invariant tests for batch 120: RW entropy, l-diversity,
t-closeness."""

from __future__ import annotations

import math

from pdal_spark.operators.graph import random_walk_entropy
from pdal_spark.operators.textops import l_diversity, t_closeness


def test_rw_entropy_cycle_is_ln2(spark):
    # 4-cycle: every degree 2 -> H = ln 2
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = random_walk_entropy(df).collect()[0]
    assert abs(r["h"] - math.log(2)) < 2e-3
    assert r["two_m"] == 8


def test_rw_entropy_star_leaves_contribute_zero(spark):
    # star K1,4: leaves deg 1 (ln 1 = 0); center deg 4
    edges = [(0, i) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = random_walk_entropy(df).collect()[0]
    assert abs(r["h"] - 4 * math.log(4) / 8) < 2e-3


def test_l_diversity_counts(spark):
    rows = [("a", 1, 10), ("a", 1, 10), ("a", 1, 20),
            ("b", 2, 30), ("b", 2, 30)]
    df = spark.createDataFrame(rows, "qa string, qb long, sv long")
    out = {(r["qa"], r["qb"]): r for r in l_diversity(
        df, ["qa", "qb"], "sv").collect()}
    assert out[("a", 1)]["k"] == 3 and out[("a", 1)]["l"] == 2
    assert out[("a", 1)]["top_count"] == 2
    assert out[("b", 2)]["l"] == 1  # no diversity


def test_t_closeness_matching_group_is_zero(spark):
    # both groups have the SAME {1,2,3} mix -> per-group dist ==
    # global dist -> EMD 0 for both; then skew group 1
    rows = [(0, v) for v in (1, 2, 3)] * 4 \
        + [(1, v) for v in (1, 2, 3)] * 4
    df = spark.createDataFrame(rows, "g long, v long")
    out = {r["g"]: r["emd"] for r in t_closeness(
        df, ["g"], "v").collect()}
    assert out[0] == 0.0 and out[1] == 0.0
    # skewing group 1 moves the GLOBAL toward it — group 0
    # becomes the outlier (hand-computed: 1/6 vs 1/12)
    skewed = rows + [(1, 1)] * 12
    df2 = spark.createDataFrame(skewed, "g long, v long")
    out2 = {r["g"]: r["emd"] for r in t_closeness(
        df2, ["g"], "v").collect()}
    assert abs(out2[0] - 1 / 6) < 1e-12
    assert abs(out2[1] - 1 / 12) < 1e-12
    # identical-distribution sanity: one group only
    uni = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "g long, v long"
    )
    assert t_closeness(uni, ["g"], "v").collect()[0]["emd"] == 0.0
