"""3D neighborhood features: radius_join_3d, covariance3d,
neighborhood_features_3d (filters.covariancefeatures /
filters.normal native-3D parity)."""

import numpy as np
import pytest

from pdal_spark.operators import features3d as f3


def test_radius_join_3d_is_a_ball_not_a_cylinder(spark):
    df = spark.createDataFrame(
        [(0, 0.0, 0.0, 0.0), (1, 1.0, 0.0, 0.0), (2, 0.0, 0.0, 1.5),
         (3, 0.9, 0.0, 0.9)],
        ["pid", "lon", "lat", "z"],
    )
    pairs = {(r.src_id, r.nb_id) for r in
             f3.radius_join_3d(df, df, 1.0).collect()}
    assert (0, 1) in pairs            # planar neighbor
    assert (0, 2) not in pairs        # same xy, dz = 1.5 > r
    assert (0, 3) not in pairs        # 3D dist ~1.27 > r (cyl would keep)
    assert all((p, p) in pairs for p in range(4))  # include_self


def _plane_fixture(spark, n=40):
    # points on z = 0.1x + 0.2y with LCG xy: planar neighborhood
    rows = []
    for i in range(n):
        x = float((i * 48271) % 97) / 10.0
        y = float((i * 69621) % 89) / 10.0
        rows.append((i, x, y, 0.1 * x + 0.2 * y))
    return spark.createDataFrame(rows, ["pid", "lon", "lat", "z"])


def test_covariance3d_invariants_match_numpy(spark):
    df = _plane_fixture(spark)
    out = f3.covariance3d(df, radius=4.0).collect()
    pts = {r.pid: r for r in df.collect()}
    xs = np.array([[pts[i].lon, pts[i].lat, pts[i].z]
                   for i in sorted(pts)])
    for r in out[:10]:
        c = np.array([[r.cxx, r.cxy, r.cxz],
                      [r.cxy, r.cyy, r.cyz],
                      [r.cxz, r.cyz, r.czz]])
        # recompute covariance brute force for this neighborhood
        p0 = xs[r.pid]
        nb = xs[np.sqrt(((xs - p0) ** 2).sum(1)) <= 4.0]
        want = np.cov(nb.T, bias=True) if len(nb) > 1 else np.zeros((3, 3))
        assert np.allclose(c, want, atol=1e-9)
        assert r.trace3 == pytest.approx(np.trace(want), abs=1e-9)
        assert r.det3 == pytest.approx(np.linalg.det(want), abs=1e-9)


def test_features3d_plane_is_planar(spark):
    df = _plane_fixture(spark)
    out = f3.neighborhood_features_3d(df, radius=4.0).collect()
    # exact plane: smallest eigenvalue ~ 0 -> planarity high,
    # scattering ~ 0; normal = unit normal of the plane, nz > 0
    want_n = np.array([-0.1, -0.2, 1.0])
    want_n /= np.linalg.norm(want_n)
    for r in out:
        if r.n_neighbors < 4:
            continue
        assert r.eigenvalue_3 == pytest.approx(0.0, abs=1e-9)
        assert r.scattering == pytest.approx(0.0, abs=1e-6)
        assert r.planarity > 0.1
        got = np.array([r.normal_x, r.normal_y, r.normal_z])
        assert np.allclose(np.abs(got @ want_n), 1.0, atol=1e-6)
        assert r.normal_z > 0
        assert r.sum_eigen == pytest.approx(r.trace3, abs=1e-9)
        assert r.surface_variation == pytest.approx(0.0, abs=1e-6)


def test_features3d_modes(spark):
    df = _plane_fixture(spark, 25)
    raw = {r.pid: r for r in
           f3.neighborhood_features_3d(df, radius=5.0).collect()}
    nrm = {r.pid: r for r in f3.neighborhood_features_3d(
        df, radius=5.0, mode="normalized").collect()}
    sq = {r.pid: r for r in f3.neighborhood_features_3d(
        df, radius=5.0, mode="sqrt").collect()}
    for pid, r in raw.items():
        # eigenvalue columns are ALWAYS raw; features change by mode
        assert nrm[pid].eigenvalue_1 == pytest.approx(r.eigenvalue_1)
        s = r.eigenvalue_1 + r.eigenvalue_2 + r.eigenvalue_3
        if s > 0:
            assert nrm[pid].sum_eigen == pytest.approx(1.0, abs=1e-9)
            assert sq[pid].sum_eigen == pytest.approx(
                np.sqrt(r.eigenvalue_1) + np.sqrt(r.eigenvalue_2)
                + np.sqrt(r.eigenvalue_3), abs=1e-9)
    with pytest.raises(ValueError):
        f3.neighborhood_features_3d(df, radius=5.0, mode="bogus")


def test_knn_join_3d_matches_brute_force(spark):
    from pdal_spark.operators.knn import knn_join_3d

    df = _plane_fixture(spark, 35)
    # give z real spread so 2D and 3D rankings genuinely differ
    df = df.selectExpr("pid", "lon", "lat",
                       "z + cast(pid % 7 as double) AS z")
    rows = sorted(df.collect(), key=lambda r: r.pid)
    xs = np.array([[r.lon, r.lat, r.z] for r in rows])
    out = knn_join_3d(df, df, k=3, radius0=1.0,
                      include_self=False).collect()
    got = {}
    for r in out:
        got.setdefault(r.src_id, []).append((r.nn_rank, r.nb_id))
    for i, r in enumerate(rows):
        d = np.sqrt(((xs - xs[i]) ** 2).sum(1))
        order = sorted(
            (float(d[j]), rows[j].pid)
            for j in range(len(rows)) if j != i
        )
        want = [pid for _, pid in order[:3]]
        assert [nb for _, nb in sorted(got[r.pid])] == want
    # 2D kNN would rank differently for at least one point (z matters)
    from pdal_spark.operators.knn import knn_join

    flat = {(r.src_id, r.nn_rank): r.nb_id for r in knn_join(
        df, df, k=3, cell=4.0, include_self=False,
        id_left="pid", id_right="pid").collect()}
    diffs = sum(
        1 for (s, rk), nb in flat.items()
        if (rk, nb) not in got.get(s, [])
    )
    assert diffs > 0


def test_knn_join_3d_under_k_warns(spark):
    import warnings

    from pdal_spark.operators.knn import knn_join_3d

    df = spark.createDataFrame(
        [(0, 0.0, 0.0, 0.0), (1, 0.5, 0.0, 0.0),
         (2, 1000.0, 1000.0, 0.0)],
        ["pid", "lon", "lat", "z"],
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = knn_join_3d(df, df, k=2, radius0=1.0, max_rounds=2,
                          include_self=False).collect()
        assert any("under-k" in str(x.message)
                   or "zero-candidate" in str(x.message) for x in w)
    by_src = {}
    for r in out:
        by_src.setdefault(r.src_id, []).append(r.nb_id)
    assert by_src.get(0) == [1] and by_src.get(1) == [0]
