"""kNN / radius / clustering oracle tests (numpy brute force)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdal_spark.operators import cluster as C
from pdal_spark.operators import knn as K


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(300),
            "x": rng.uniform(0, 100, 300),
            "y": rng.uniform(0, 100, 300),
            "cls": rng.integers(0, 3, 300),
        }
    )
    return spark.createDataFrame(pdf), pdf


def brute_knn(pdf, k):
    xs, ys = pdf.x.to_numpy(), pdf.y.to_numpy()
    d = np.sqrt((xs[:, None] - xs) ** 2 + (ys[:, None] - ys) ** 2)
    np.fill_diagonal(d, np.inf)
    out = {}
    for i in range(len(xs)):
        # tie-break (dist, pid) like the engine
        order = sorted(range(len(xs)), key=lambda j: (d[i, j], j))
        out[i] = [(j, d[i, j]) for j in order[:k]]
    return out


def test_knn_exact_small_cell_forces_ring_expansion(pts):
    sdf, pdf = pts
    # cell = 2.0 over a 100x100 box with ~300 points: most cells are
    # empty, so k=5 needs multiple ring expansions -> exercises the
    # completeness-bound loop.
    nn = K.knn_join(
        sdf, sdf, k=5, cell=2.0, x="x", y="y",
        id_left="pid", id_right="pid", include_self=False,
    ).toPandas()
    oracle = brute_knn(pdf, 5)
    got = {
        s: set(g["nb_id"]) for s, g in nn.groupby("src_id")
    }
    assert len(got) == 300
    for i, exp in oracle.items():
        assert got[i] == {j for j, _ in exp}, f"pid {i}"


def test_knn_exact_negative_coords_supercell_halo(spark):
    # Regression: halo duplication used Spark `%` (sign-of-dividend
    # remainder), silently skipping super-cell edge candidates for
    # NEGATIVE cell coordinates -> incomplete 3x3 blocks marked
    # settled. Points straddle the origin so cells span negatives.
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(400),
            "x": rng.uniform(-60, 60, 400),
            "y": rng.uniform(-60, 60, 400),
        }
    )
    sdf = spark.createDataFrame(pdf)
    nn = K.knn_join(
        sdf, sdf, k=3, cell=8.0, x="x", y="y",
        id_left="pid", id_right="pid", include_self=False,
        supercell=4,
    ).toPandas()
    oracle = brute_knn(pdf, 3)
    got = {s: set(g["nb_id"]) for s, g in nn.groupby("src_id")}
    assert len(got) == 400
    for i, exp in oracle.items():
        assert got[i] == {j for j, _ in exp}, f"pid {i}"


def test_radius_join_matches_brute(pts):
    sdf, pdf = pts
    r = 7.5
    pairs = K.radius_join(
        sdf, sdf, r, x="x", y="y", id_left="pid", id_right="pid",
        include_self=False,
    ).toPandas()
    xs, ys = pdf.x.to_numpy(), pdf.y.to_numpy()
    d2 = (xs[:, None] - xs) ** 2 + (ys[:, None] - ys) ** 2
    m = (d2 <= r * r) & ~np.eye(300, dtype=bool)
    exp = {(i, j) for i, j in zip(*np.nonzero(m))}
    assert set(zip(pairs.src_id, pairs.nb_id)) == exp


def test_cluster_euclidean_matches_union_find(pts):
    sdf, pdf = pts
    tol = 6.0
    out = C.cluster_euclidean(
        sdf, tol, x="x", y="y", id_col="pid"
    ).toPandas()
    # union-find oracle
    xs, ys = pdf.x.to_numpy(), pdf.y.to_numpy()
    parent = list(range(300))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    d2 = (xs[:, None] - xs) ** 2 + (ys[:, None] - ys) ** 2
    for i, j in zip(*np.nonzero(d2 <= tol * tol)):
        if i < j:
            parent[find(i)] = find(j)
    roots = [find(i) for i in range(300)]
    # compare partitions (same grouping, labels may differ)
    exp_groups = {}
    for i, r in enumerate(roots):
        exp_groups.setdefault(r, set()).add(i)
    got_groups = {}
    for _, row in out.iterrows():
        got_groups.setdefault(row["cluster_id"], set()).add(row["pid"])
    assert sorted(map(sorted, exp_groups.values())) == sorted(
        map(sorted, got_groups.values())
    )


def test_dbscan_core_noise(spark):
    # two dense blobs + isolated noise points
    rng = np.random.default_rng(3)
    blob1 = rng.normal((10, 10), 0.5, (40, 2))
    blob2 = rng.normal((50, 50), 0.5, (40, 2))
    noise = np.array([[90.0, 5.0], [5.0, 90.0]])
    all_pts = np.vstack([blob1, blob2, noise])
    pdf = pd.DataFrame(
        {"pid": range(len(all_pts)), "x": all_pts[:, 0], "y": all_pts[:, 1]}
    )
    out = C.dbscan(
        spark.createDataFrame(pdf), eps=2.0, min_points=5,
        x="x", y="y", id_col="pid",
    ).toPandas().sort_values("pid")
    labs = out["cluster_id"].to_numpy()
    assert len(set(labs[:40])) == 1 and labs[0] != -1
    assert len(set(labs[40:80])) == 1 and labs[40] != labs[0]
    assert (labs[80:] == -1).all()


def test_outlier_radius_and_statistical(pts, spark):
    sdf, pdf = pts
    base = sdf.withColumn("classification", F.lit(1))
    flagged = K.outlier_radius(
        base, radius=5.0, min_k=2, x="x", y="y", id_col="pid"
    ).toPandas()
    xs, ys = pdf.x.to_numpy(), pdf.y.to_numpy()
    d2 = (xs[:, None] - xs) ** 2 + (ys[:, None] - ys) ** 2
    nb = ((d2 <= 25.0).sum(axis=1) - 1)
    exp_noise = set(pdf.pid[nb < 2])
    got_noise = set(
        flagged[flagged.classification == 7]["pid"]
    )
    assert got_noise == exp_noise
    out2 = K.outlier_statistical(
        base, mean_k=4, multiplier=1.0, x="x", y="y", id_col="pid",
        cell=10.0,
    )
    n7 = out2.where(F.col("classification") == 7).count()
    assert 0 < n7 < 300


def test_zsmooth_and_reciprocity(pts):
    sdf, pdf = pts
    z = sdf.withColumn("z", F.col("x") + F.col("y"))
    sm = K.zsmooth(
        z, radius=10.0, dim="z", x="x", y="y", id_col="pid"
    )
    assert sm.where(F.col("z_smooth").isNull()).count() == 0
    rec = K.reciprocity(sdf, k=4, x="x", y="y", id_col="pid", cell=10.0)
    vals = rec.select("reciprocity").toPandas()["reciprocity"]
    assert vals.between(0, 100).all()


def test_radius_assign(spark):
    pdf = pd.DataFrame(
        {
            "pid": range(6),
            "x": [0.0, 1.0, 50.0, 51.0, 100.0, 150.0],
            "y": [0.0] * 6,
            "cls": [2.0, 1.0, 2.0, 1.0, 1.0, 1.0],
        }
    )
    out = C.radius_assign(
        spark.createDataFrame(pdf),
        radius=5.0,
        src_domain=["cls[1:1]"],
        reference_domain=["cls[2:2]"],
        update=["cls = 9"],
        x="x", y="y", id_col="pid",
    ).toPandas().sort_values("pid")
    # pids 1 and 3 are cls=1 within 5 of a cls=2 point -> updated
    assert out["cls"].tolist() == [2.0, 9.0, 2.0, 9.0, 1.0, 1.0]


def test_sample_poisson_invariants(spark):
    # the reference's guarantees (SampleFilter.cpp): kept points are
    # pairwise >= radius apart; every dropped point has a kept point
    # within radius (maximality). The parallel 4-color greedy keeps a
    # possibly different maximal set — invariants must still hold.
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(500),
            "x": rng.uniform(-50, 50, 500),
            "y": rng.uniform(-50, 50, 500),
        }
    )
    from pdal_spark.operators.sampling import sample_poisson

    sdf = spark.createDataFrame(pdf)
    kept = sample_poisson(
        sdf, 6.0, x="x", y="y", id_col="pid"
    ).toPandas()
    kx = kept.x.to_numpy()
    ky = kept.y.to_numpy()
    d = np.sqrt((kx[:, None] - kx) ** 2 + (ky[:, None] - ky) ** 2)
    np.fill_diagonal(d, np.inf)
    assert (d >= 6.0).all(), "kept points closer than radius"
    dropped = pdf[~pdf.pid.isin(kept.pid)]
    dd = np.sqrt(
        (dropped.x.to_numpy()[:, None] - kx) ** 2
        + (dropped.y.to_numpy()[:, None] - ky) ** 2
    )
    assert (dd.min(axis=1) < 6.0).all(), "dropped point not covered"


def test_fps_deterministic_and_spread(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(200),
            "x": rng.uniform(0, 100, 200),
            "y": rng.uniform(0, 100, 200),
        }
    )
    from pdal_spark.operators.sampling import fps

    sdf = spark.createDataFrame(pdf)
    a = sorted(fps(sdf, 6, x="x", y="y", id_col="pid")
               .toPandas().pid)
    b = sorted(fps(sdf, 6, x="x", y="y", id_col="pid")
               .toPandas().pid)
    assert a == b and len(a) == 6
    # FPS picks spread-out points: min pairwise distance among the 6
    # picked must beat a random subset's typical spacing
    sel = pdf[pdf.pid.isin(a)]
    sx, sy = sel.x.to_numpy(), sel.y.to_numpy()
    d = np.sqrt((sx[:, None] - sx) ** 2 + (sy[:, None] - sy) ** 2)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 20.0


def test_icp_recovers_transform(spark):
    # rotate+translate a cloud; ICP must recover the inverse to
    # high precision and converge to ~zero error (exact NN
    # correspondences since the clouds are copies)
    import math

    from pdal_spark.operators.register import icp

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(400),
            "x": rng.uniform(0, 40, 400),
            "y": rng.uniform(0, 40, 400),
        }
    )
    theta, tx, ty = 0.05, 3.0, -2.0  # small motion: NN mostly correct
    ct, st = math.cos(theta), math.sin(theta)
    moved = pd.DataFrame(
        {
            "pid": pdf.pid,
            "x": ct * pdf.x - st * pdf.y + tx,
            "y": st * pdf.x + ct * pdf.y + ty,
        }
    )
    fixed = spark.createDataFrame(pdf)
    moving = spark.createDataFrame(moved)
    out, meta = icp(moving, fixed, x="x", y="y", id_moving="pid",
                    id_fixed="pid", cell=8.0, max_iters=25)
    assert meta["mse"][-1] < 1e-12, meta["mse"]
    # composed transform == inverse of the applied motion
    assert abs(meta["theta"] + theta) < 1e-6
    got = out.toPandas().sort_values("pid").reset_index(drop=True)
    assert np.allclose(got.x, pdf.x, atol=1e-6)
    assert np.allclose(got.y, pdf.y, atol=1e-6)


def test_radius_join_ring_invariant(spark):
    """The result set must not depend on the cell size (ring width):
    loop-codegen'd sequence explosion at ring 3 and 4 must equal the
    single-ring bucketing (regression for the 64KB unrolled-array
    rewrite of _explode_ring)."""
    import random

    from pdal_spark.operators.knn import radius_join

    random.seed(7)
    pts = [(i, random.uniform(0, 50), random.uniform(0, 50))
           for i in range(400)]
    df = spark.createDataFrame(pts, "pid long, px double, py double")

    def pairs(cell):
        out = radius_join(
            df, df, 6.0, x="px", y="py", id_left="pid",
            id_right="pid", cell=cell, include_self=False,
        )
        return {
            (r["src_id"], r["nb_id"])
            for r in out.select("src_id", "nb_id").collect()
        }

    base = pairs(6.0)   # ring 1
    assert len(base) > 0
    assert pairs(2.0) == base   # ring 3
    assert pairs(1.5) == base   # ring 4


def _serial_greedy(pts, r):
    """Reference serial Poisson-disk greedy in list order."""
    kept = []
    out = []
    for pid, x, y in pts:
        if all((x - kx) ** 2 + (y - ky) ** 2 >= r * r
               for kx, ky in kept):
            kept.append((x, y))
            out.append(pid)
    return sorted(out)


@pytest.mark.parametrize("seed,n,scale", [
    (1, 300, 100.0),   # scattered
    (2, 300, 12.0),    # dense: deep dependency chains
    (3, 500, 40.0),    # mid-density
])
def test_sample_poisson_exact_equals_serial(spark, seed, n, scale):
    """The dependency-depth fixpoint must reproduce the serial scan
    point-for-point on clouds of varying chain depth (the claim the
    recursive-CTE oracle checks on one fixture, asserted here across
    densities including a chain-heavy dense cloud)."""
    import numpy as np

    from pdal_spark.operators.sampling import sample_poisson_exact

    rng = np.random.default_rng(seed)
    xs = rng.uniform(0, scale, n)
    ys = rng.uniform(0, scale, n)
    pts = [(i, float(xs[i]), float(ys[i])) for i in range(n)]
    expected = _serial_greedy(pts, 5.0)
    df = spark.createDataFrame(pts, ["pid", "px", "py"])
    got = sorted(
        r["pid"]
        for r in sample_poisson_exact(
            df, 5.0, x="px", y="py", id_col="pid"
        ).collect()
    )
    assert got == expected


def test_star_cc_path_graph_beats_diameter(spark):
    """A 600-node path graph: O(diameter) min-label propagation
    would need 600 rounds; large-star/small-star collapses it to one
    component within its O(log^2 n) budget."""
    from pyspark.sql import functions as F

    from pdal_spark.operators.cluster import connected_components_star

    n = 600
    nodes = spark.range(n).select(F.col("id").alias("pid"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("src_id"), (F.col("id") + 1).alias("nb_id"))
    got = connected_components_star(nodes, edges).collect()
    assert len(got) == n and all(r.component == 0 for r in got)


def test_star_cc_matches_union_find(spark):
    """Random (directed-input) graph vs a serial union-find oracle —
    also proves the star form symmetrizes raw edge lists itself."""
    import random

    from pyspark.sql import functions as F

    from pdal_spark.operators.cluster import connected_components_star

    random.seed(7)
    n = 200
    es = [(random.randrange(n), random.randrange(n)) for _ in range(150)]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in es:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    truth = {x: find(x) for x in range(n)}

    nodes = spark.range(n).select(F.col("id").alias("pid"))
    edf = spark.createDataFrame(es, "src_id long, nb_id long")
    got = {r.pid: r.component
           for r in connected_components_star(nodes, edf).collect()}
    assert got == truth
