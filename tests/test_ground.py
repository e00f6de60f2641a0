"""Ground classification invariants (filters.smrf / filters.pmf
analogs): a gentle terrain plane with a raised 2x2 "building" block —
the canonical morphological-filter scenario (SMRFilter.cpp,
PMFFilter.cpp). Building points must be cut to non-ground, plane
points kept as ground."""

import pytest
from pyspark.sql import functions as F

from pdal_spark.operators import ground as G

BUILDING = {(4, 4), (4, 5), (5, 4), (5, 5)}


@pytest.fixture(scope="module")
def scene(spark):
    rows = []
    pid = 0
    for cx in range(10):
        for cy in range(10):
            z = 0.1 * (cx + cy)
            if (cx, cy) in BUILDING:
                z += 50.0
            rows.append((pid, cx + 0.5, cy + 0.5, z))
            pid += 1
    return spark.createDataFrame(
        rows, "pid long, px double, py double, z double"
    )


def _classes(out):
    got = {
        r["pid"]: r["cls"]
        for r in out.select("pid", "cls").collect()
    }
    non_ground = {p for p, c in got.items() if c == 1}
    building = {
        p
        for p in got
        if ((p // 10), (p % 10)) in BUILDING
    }
    return got, non_ground, building


def test_smrf_cuts_building_keeps_plane(scene):
    out = G.smrf(
        scene, cell=1.0, slope=0.3, window=3.0, scalar=1.25,
        threshold=0.5, x="px", y="py", z="z", id_col="pid",
    )
    got, non_ground, building = _classes(out)
    assert len(got) == 100 and set(got.values()) <= {1, 2}
    assert non_ground == building


def test_pmf_cuts_building_keeps_plane(scene):
    out = G.pmf(
        scene, cell_size=1.0, max_window=9.0, slope=0.05,
        initial_distance=1.0, max_distance=5.0, exponential=True,
        x="px", y="py", z="z", id_col="pid",
    )
    got, non_ground, building = _classes(out)
    assert len(got) == 100 and set(got.values()) <= {1, 2}
    assert non_ground == building


def test_pmf_window_series_matches_reference_shape():
    # PMFFilter.cpp:297-326 exponential series at cell_size=1:
    # windows 3, 5, 9, 17, 33; thresholds grow with window deltas,
    # capped at max_distance
    s = G.pmf_windows(1.0, 33.0, 1.0, 0.15, 2.5, True)
    assert [w for w, _h, _i in s] == [3.0, 5.0, 9.0, 17.0, 33.0]
    assert s[0][1] == 0.15
    assert all(h <= 2.5 for _w, h, _i in s)
    assert [i for _w, _h, i in s] == [1, 2, 4, 8, 16]


def test_smrf_all_ground_on_pure_plane(spark):
    rows = [
        (cx * 8 + cy, float(cx), float(cy), 0.05 * (cx + cy))
        for cx in range(8)
        for cy in range(8)
    ]
    df = spark.createDataFrame(
        rows, "pid long, px double, py double, z double"
    )
    out = G.smrf(
        df, cell=1.0, slope=0.3, window=2.0, scalar=1.25,
        threshold=0.5, x="px", y="py", z="z", id_col="pid",
    )
    assert (
        out.where(F.col("cls") != 2).count() == 0
    ), "smooth plane must be entirely ground"


def test_csf_cuts_building_keeps_plane(scene):
    out = G.csf(
        scene, resolution=1.0, time_step=0.65, class_threshold=0.5,
        rigidness=3, iterations=16, gravity=2.0,
        x="px", y="py", z="z", id_col="pid",
    )
    got, non_ground, building = _classes(out)
    assert len(got) == 100 and set(got.values()) <= {1, 2}
    # inverted building cells are pits the rigid cloth spans over
    assert non_ground == building


# --- filters.relaxationdartthrowing (RelaxationDartThrowing.cpp) ---

def test_relaxation_dart_throwing_reaches_count(spark):
    import itertools
    import math as m

    from pdal_spark.operators.sampling import (
        relaxation_dart_throwing,
    )

    pts = [
        (20 * i + j, float(i), float(j))
        for i in range(20) for j in range(20)
    ]
    df = spark.createDataFrame(
        pts, "pid long, px double, py double"
    )
    out = relaxation_dart_throwing(
        df, count=30, radius=6.0, decay=0.8,
        x="px", y="py", id_col="pid",
    )
    rows = out.collect()
    assert len(rows) == 30
    r_fin = rows[0]["rdt_radius"]
    assert all(row["rdt_radius"] == r_fin for row in rows)
    coords = [(row["px"], row["py"]) for row in rows]
    mind = min(
        m.dist(a, b) for a, b in itertools.combinations(coords, 2)
    )
    assert mind >= r_fin, (mind, r_fin)


def test_sample_poisson_pinned_survive(spark):
    from pdal_spark.operators.sampling import sample_poisson

    df = spark.createDataFrame(
        [(i, float(i % 7), float(i // 7)) for i in range(49)],
        "pid long, px double, py double",
    )
    pin = spark.createDataFrame(
        [(3, 3.0, 0.0), (24, 3.0, 3.0)],
        "pid long, px double, py double",
    )
    out = sample_poisson(
        df, 2.0, x="px", y="py", id_col="pid", pinned=pin
    )
    ids = {r["pid"] for r in out.collect()}
    assert {3, 24} <= ids


def test_ground_classifiers_stay_jvm_side(scene):
    """SMRF/PMF/CSF are pure Catalyst: no Python UDF nodes may
    appear in the physical plan (the 100TB-scale contract — the
    cloth/morphology loops never leave the JVM)."""
    for out in [
        G.smrf(scene, cell=1.0, window=2.0, x="px", y="py", z="z",
               id_col="pid"),
        G.pmf(scene, cell_size=1.0, max_window=3.0, x="px", y="py",
              z="z", id_col="pid"),
        G.csf(scene, resolution=1.0, iterations=2, x="px", y="py",
              z="z", id_col="pid"),
    ]:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "FlatMapGroupsInPandas" not in plan


def test_skewness_balancing_prefix_property(spark):
    from pdal_spark.operators.ground import skewness_balancing

    # symmetric low cloud + heavy high tail: positive skewness kicks
    # in once the tail enters the prefix
    rows = [(i, float(i % 50)) for i in range(500)] + [
        (1000 + i, 400.0 + 10.0 * i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "pid long, z double")
    out = skewness_balancing(df, z="z", id_col="pid").collect()
    ground = [r for r in out if r["cls"] == 2]
    other = [r for r in out if r["cls"] == 1]
    assert ground and other
    # classes split the z-order: every non-ground z >= every ground z
    assert min(r["z"] for r in other) >= max(
        r["z"] for r in ground
    )
    # the injected tail must never be ground
    assert all(r["cls"] == 1 for r in out if r["pid"] >= 1000)
