"""Invariants for the extended neighborhood-features family:
optimal_neighborhood (OptimalNeighborhoodFilter.cpp), plane_fit
(PlaneFitFilter.cpp), miniball (MiniballFilter.cpp)."""

import math

import pytest
from pyspark.sql import functions as F

from pdal_spark.operators import features as FE


@pytest.fixture(scope="module")
def cloud(spark):
    # two tight colinear clusters + scattered noise: forces distinct
    # optimal k / planefit / miniball regimes
    rows = []
    pid = 0
    for i in range(12):  # a horizontal line, binary-exact coords
        rows.append((pid, 0.25 * i, 3.0))
        pid += 1
    for i in range(12):  # a blob
        rows.append((pid, 5.0 + 0.07 * (i % 4), 5.0 + 0.07 * (i // 4)))
        pid += 1
    for i in range(6):  # sparse noise
        rows.append((pid, 10.0 + 1.3 * i, -3.0 + 0.9 * i * i % 7))
        pid += 1
    return spark.createDataFrame(rows, "pid long, px double, py double")


def test_optimal_neighborhood_bounds(cloud):
    out = FE.optimal_neighborhood(
        cloud, min_k=3, max_k=6, cell=2.0, x="px", y="py",
        id_col="pid",
    ).collect()
    assert len(out) == 30
    for r in out:
        assert 3 <= r["optimal_k"] <= 6
        assert r["optimal_radius"] >= 0.0


def test_plane_fit_line_points_near_zero(cloud):
    out = FE.plane_fit(
        cloud, k=4, cell=2.0, x="px", y="py", id_col="pid"
    )
    vals = {r["pid"]: r["planefit"] for r in out.collect()}
    assert all(0.0 <= v <= 1.0 for v in vals.values())
    # interior line points: neighbors exactly colinear (y = 3.0,
    # binary-exact) -> cyy = cxy = 0 exactly, normal (0, ±1),
    # d = dbar = 0 -> guarded planefit = 0
    for pid in range(2, 10):
        assert vals[pid] == 0.0


def test_miniball_matches_bruteforce(cloud):
    out = FE.miniball(
        cloud, k=4, cell=2.0, x="px", y="py", id_col="pid"
    )
    vals = {r["pid"]: r["miniball"] for r in out.collect()}
    assert all(0.0 <= v < 1.0 for v in vals.values())

    # python reference: smallest enclosing circle of the 4 exact
    # nearest neighbors (same candidate construction), for a few pids
    pts = {r["pid"]: (r["px"], r["py"]) for r in cloud.collect()}
    import itertools

    for pid in [0, 5, 13, 25]:
        px, py = pts[pid]
        nbrs = sorted(
            (math.hypot(qx - px, qy - py), j)
            for j, (qx, qy) in pts.items() if j != pid
        )[:4]
        P = [pts[j] for _d, j in nbrs]
        cands = []
        for (x1, y1), (x2, y2) in itertools.combinations(P, 2):
            cands.append(((x1 + x2) / 2, (y1 + y2) / 2))
        for (x1, y1), (x2, y2), (x3, y3) in itertools.combinations(P, 3):
            det = 2 * (x1 * (y2 - y3) + x2 * (y3 - y1) + x3 * (y1 - y2))
            if det == 0:
                continue
            a2, b2, c2 = x1 * x1 + y1 * y1, x2 * x2 + y2 * y2, x3 * x3 + y3 * y3
            cands.append((
                (a2 * (y2 - y3) + b2 * (y3 - y1) + c2 * (y1 - y2)) / det,
                (a2 * (x3 - x2) + b2 * (x1 - x3) + c2 * (x2 - x1)) / det,
            ))
        best = min(
            (max((qx - ux) ** 2 + (qy - uy) ** 2 for qx, qy in P), ux, uy)
            for ux, uy in cands
        )
        r = math.sqrt(best[0])
        d = math.hypot(px - best[1], py - best[2])
        want = d / (d + 2 * r / math.sqrt(2))
        assert vals[pid] == pytest.approx(want, abs=1e-9)


def test_m3c2_detects_vertical_shift(spark):
    from pdal_spark.operators.register import m3c2

    # cloud1: horizontal line at y=0; cloud2: same line shifted to
    # y=2 -> normal is (0,1), every along-normal offset is exactly
    # 2.0, variance 0 -> distance 2, LOD 0, significant
    c1 = spark.createDataFrame(
        [(i, 0.5 * i, 0.0) for i in range(20)],
        "pid long, px double, py double",
    )
    c2 = spark.createDataFrame(
        [(100 + i, 0.5 * i, 2.0) for i in range(20)],
        "pid long, px double, py double",
    )
    out = m3c2(
        c1, c2, normal_radius=2.0, cyl_radius=1.0, cyl_halflen=4.0,
        x="px", y="py", id1="pid", id2="pid", cell=2.0,
    ).collect()
    assert len(out) == 20
    for r in out:
        assert r["m3c2_distance"] == 2.0
        assert r["m3c2_uncertainty"] == 0.0
        assert r["m3c2_significant"] == 1
        assert r["m3c2_std_dev1"] == 0.0 and r["m3c2_std_dev2"] == 0.0


def test_edge_cases_no_crash(spark):
    """Empty / single-row / duplicate-coordinate inputs must not
    raise (ANSI division, driver collects on empty aggregates)."""
    from pdal_spark.operators import ground as G
    from pdal_spark.operators.cluster import kmeans_exact

    empty = spark.createDataFrame(
        [], "pid long, px double, py double, z double"
    )
    one = spark.createDataFrame(
        [(1, 0.0, 0.0, 5.0)], "pid long, px double, py double, z double"
    )
    dups = spark.createDataFrame(
        [(i, 1.0, 1.0) for i in range(6)],
        "pid long, px double, py double",
    )
    assert G.csf(empty, resolution=1.0, iterations=2, x="px",
                 y="py", z="z", id_col="pid").count() == 0
    assert kmeans_exact(one, k=2, iters=2, x="px", y="py",
                        id_col="pid").count() == 1
    assert kmeans_exact(empty, k=2, iters=2, x="px", y="py",
                        id_col="pid").count() == 0
    # min_k=1 clamps to 2; single point yields no neighborhoods
    assert FE.optimal_neighborhood(
        one, min_k=1, max_k=2, cell=1.0, x="px", y="py",
        id_col="pid",
    ).count() == 0
    # all-duplicate coords: entropy undefined everywhere -> rows
    # still come back (inf sentinel, smallest k wins the tie)
    out = FE.optimal_neighborhood(
        dups, min_k=2, max_k=4, cell=1.0, x="px", y="py",
        id_col="pid",
    )
    assert out.count() == 6
    assert all(r["optimal_k"] == 2 for r in out.collect())


def test_overlay_concave_polygon_jvm_pure(spark):
    """A concave overlay polygon must use the Catalyst ray cast (no
    Python UDF) and classify interior/exterior points correctly."""
    from pdal_spark.operators.overlay import overlay

    arrow = "POLYGON((-4 -3, 0 4, 4 -3, 0 -0.5, -4 -3))"
    df = spark.createDataFrame(
        [(1, 0.0, 2.0, 0), (2, 0.0, -2.0, 0), (3, 9.0, 9.0, 0)],
        "pid long, px double, py double, zone long",
    )
    out = overlay(df, [(arrow, 7)], "zone", x="px", y="py")
    got = {r["pid"]: r["zone"] for r in out.collect()}
    # (0,2) inside; (0,-2) in the concave notch -> outside; (9,9) out
    assert got == {1: 7, 2: 0, 3: 0}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
