"""modularity + clustering_nmi: hand-computed values on known
partitions and the boundary cases (perfect / independent)."""

import itertools
import math

from pyspark.sql import Row

from pdal_spark.operators.cluster import NMI_Q, clustering_nmi
from pdal_spark.operators.graph import label_propagation, modularity


def _edges_df(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _assign_df(spark, d):
    return spark.createDataFrame(
        [Row(node=n, community=c) for n, c in d.items()]
    )


def test_modularity_two_cliques_vs_merged(spark):
    # two 4-cliques joined by one bridge edge
    pairs = list(itertools.combinations(range(4), 2)) \
        + list(itertools.combinations(range(4, 8), 2)) + [(0, 4)]
    e = _edges_df(spark, pairs)
    good = {n: (0 if n < 4 else 1) for n in range(8)}
    bad = {n: 0 for n in range(8)}
    qg = sum(r.q_contrib for r in
             modularity(e, _assign_df(spark, good)).collect())
    qb = sum(r.q_contrib for r in
             modularity(e, _assign_df(spark, bad)).collect())
    m = len(pairs)
    # hand value: per clique e_c=6, d_c=13 -> 2*(6/13 - (13/26)^2)
    assert abs(qg - 2 * (6 / m - (13 / (2 * m)) ** 2)) < 1e-12
    # the everything-in-one partition always scores 0 exactly:
    # e_c = m and d_c = 2m
    assert qb == 0.0
    assert qg > qb
    # LPA communities on this graph score near the planted partition
    lpa = label_propagation(e, rounds=3)
    ql = sum(r.q_contrib for r in modularity(e, lpa).collect())
    assert ql > 0.2


def test_nmi_boundary_cases(spark):
    # identical partitions -> NMI == 1 (up to lnq rounding)
    rows = [(i % 3, i % 3) for i in range(60)]
    df = spark.createDataFrame(rows, ["a", "b"])
    r = clustering_nmi(df, "a", "b").collect()[0]
    assert abs(r.nmi - 1.0) < 1e-5
    # independent partitions -> NMI ~= 0 (cells perfectly uniform)
    rows2 = [(i % 3, (i // 3) % 4) for i in range(120)]
    df2 = spark.createDataFrame(rows2, ["a", "b"])
    r2 = clustering_nmi(df2, "a", "b").collect()[0]
    assert abs(r2.nmi) < 1e-5


def test_nmi_matches_hand_computation(spark):
    rows = [(0, 0)] * 20 + [(0, 1)] * 5 + [(1, 1)] * 25
    df = spark.createDataFrame(rows, ["a", "b"])
    r = clustering_nmi(df, "a", "b").collect()[0]

    def lnq(x):
        return math.floor(math.log(x) * NMI_Q + 0.5)

    n = 50
    ct = {(0, 0): 20, (0, 1): 5, (1, 1): 25}
    ma = {0: 25, 1: 25}
    mb = {0: 20, 1: 30}
    mi = sum(c * (lnq(c * n) - lnq(ma[a] * mb[b]))
             for (a, b), c in ct.items())
    ha = sum(c * (lnq(n) - lnq(c)) for c in ma.values())
    hb = sum(c * (lnq(n) - lnq(c)) for c in mb.values())
    assert (r.mi_qn, r.ha_qn, r.hb_qn) == (mi, ha, hb)
    assert r.nmi == 2.0 * mi / (ha + hb)
