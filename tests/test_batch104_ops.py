"""Invariant tests for batch 104: resource allocation,
preferential attachment, Cochran's Q."""

from __future__ import annotations

from pdal_spark.operators.graph import (
    RA_Q,
    preferential_attachment,
    resource_allocation,
)
from pdal_spark.operators.stats import cochran_q


def _path4(spark):
    # path 1-2-3-4: open pairs sharing a neighbor: (1,3) via 2,
    # (2,4) via 3
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )


def test_resource_allocation_path(spark):
    out = {(r["u"], r["w"]): r
           for r in resource_allocation(_path4(spark)).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    # centers 2 and 3 both have degree 2 -> term RA_Q // 2
    assert out[(1, 3)]["ra_q"] == RA_Q // 2
    assert out[(1, 3)]["cn"] == 1


def test_preferential_attachment_path(spark):
    out = {(r["u"], r["w"]): r
           for r in preferential_attachment(_path4(spark)).collect()}
    # deg(1)=1, deg(3)=2 -> pa=2 ; deg(2)=2, deg(4)=1 -> pa=2
    assert out[(1, 3)]["pa"] == 2
    assert out[(2, 4)]["pa"] == 2


def test_resource_allocation_hub_cap(spark):
    # star 0-{1..5} plus edge 1-2: center 0 (deg 5) capped away
    edges = [(0, i) for i in range(1, 6)] + [(1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    full = resource_allocation(df).count()
    capped = resource_allocation(df, max_degree=3).count()
    assert capped < full
    # capped run keeps only wedges centered at low-degree nodes
    rows = resource_allocation(df, max_degree=3).collect()
    assert all(r["ra_q"] <= RA_Q // 1 for r in rows)


def test_cochran_q_textbook(spark):
    # 4 subjects x 3 treatments; treatment 2 always succeeds
    rows = []
    for i in range(4):
        rows += [(i, 0, 1 if i < 1 else 0), (i, 1, 1 if i < 2 else 0),
                 (i, 2, 1)]
    df = spark.createDataFrame(rows, "i long, j long, x long")
    r = cochran_q(df, "i", "j", "x").collect()[0]
    assert r["k"] == 3 and r["n_subjects"] == 4
    # G = [1,2,4], T=7, sum G^2=21, L=[3,2,1,1], sum L^2=15
    # Q = 2*(3*21-49)/(3*7-15) = 2*14/6
    assert abs(r["q"] - 2 * 14 / 6) < 1e-12


def test_cochran_q_degenerate_null(spark):
    # every subject all-1 -> k*T == sum L^2 -> NULL
    rows = [(i, j, 1) for i in range(3) for j in range(2)]
    df = spark.createDataFrame(rows, "i long, j long, x long")
    assert cochran_q(df, "i", "j", "x").collect()[0]["q"] is None
