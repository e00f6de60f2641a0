"""Batch-32 ops: Krippendorff's alpha, bilinear raster sampling,
focal curvature, zonal majority."""

import pytest

from pdal_spark.operators import crop as ops_crop
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# krippendorff_alpha
# ---------------------------------------------------------------------------


def _alpha_reference(items):
    """Independent direct implementation (per-item rational terms in
    exact Fraction arithmetic) for cross-checking the quantized op."""
    from collections import Counter
    from fractions import Fraction

    per = {i: Counter(cs) for i, cs in items.items()
           if len(cs) >= 2}
    n = sum(sum(c.values()) for c in per.values())
    do = sum(
        Fraction(sum(v * (sum(c.values()) - v) for v in c.values()),
                 sum(c.values()) - 1)
        for c in per.values()
    )
    cat_tot = Counter()
    for c in per.values():
        cat_tot.update(c)
    de = sum(v * (n - v) for v in cat_tot.values())
    return float(1 - (n - 1) * do / de)


def test_krippendorff_matches_reference(spark):
    items = {
        1: ["a", "a", "b"],
        2: ["b", "b"],
        3: ["a", "b", "b", "b"],
        4: ["c"],          # unpairable -> excluded
        5: ["a", "a", "a", "a", "c"],
    }
    rows = [(i, c) for i, cs in items.items() for c in cs]
    # map categories to ints as the op requires opaque keys? cat may
    # be any groupable type for the op (only counts matter)
    df = spark.createDataFrame(rows, ["item", "cat"])
    r = ops_stats.krippendorff_alpha(df).collect()[0]
    assert r.n_pairable == 14
    assert r.alpha == pytest.approx(_alpha_reference(items), abs=1e-6)


def test_krippendorff_perfect_agreement(spark):
    rows = [(i, i % 3) for i in range(9) for _ in range(2 + i % 2)]
    df = spark.createDataFrame(rows, ["item", "cat"])
    r = ops_stats.krippendorff_alpha(df).collect()[0]
    assert r.alpha == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------------------
# bilinear_at_points
# ---------------------------------------------------------------------------


def test_bilinear_exact_plane(spark):
    # field z = 10*gx + 100*gy is affine -> bilinear reproduces it
    cells = spark.createDataFrame(
        [(gx, gy, 10 * gx + 100 * gy)
         for gx in range(3) for gy in range(3)],
        ["gx", "gy", "z"],
    )
    pts = spark.createDataFrame(
        [(1, 500, 500), (2, 1250, 750)], ["pid", "px", "py"]
    )
    out = {r.pid: r for r in ops_raster.bilinear_at_points(
        cells, pts, sub=1000).collect()}
    assert out[1].v == pytest.approx(10 * 0.5 + 100 * 0.5)
    assert out[2].v == pytest.approx(10 * 1.25 + 100 * 0.75)


def test_bilinear_drops_incomplete_neighborhood(spark):
    cells = spark.createDataFrame(
        [(0, 0, 5), (1, 0, 7)], ["gx", "gy", "z"]
    )
    pts = spark.createDataFrame([(1, 500, 500)], ["pid", "px", "py"])
    assert ops_raster.bilinear_at_points(cells, pts).count() == 0


def test_bilinear_corner_exact(spark):
    cells = spark.createDataFrame(
        [(gx, gy, gx * 7 + gy * 13)
         for gx in range(2) for gy in range(2)],
        ["gx", "gy", "z"],
    )
    pts = spark.createDataFrame([(1, 0, 0)], ["pid", "px", "py"])
    r = ops_raster.bilinear_at_points(cells, pts).collect()[0]
    assert r.v == 0.0 and r.v_q == 0


# ---------------------------------------------------------------------------
# focal_curvature
# ---------------------------------------------------------------------------


def _grid_cells(spark, res, vals):
    from pdal_spark.sqlgen import qcell_pack

    rows = [(int(eval(qcell_pack(str(ix), str(iy), res))), v)
            for (ix, iy), v in vals.items()]
    return spark.createDataFrame(rows, ["cell", "x"])


def test_focal_curvature_flat_field_is_zero(spark):
    vals = {(ix, iy): 5 for ix in range(3) for iy in range(3)}
    df = _grid_cells(spark, 4, vals)
    out = ops_raster.focal_curvature(df, res=4).collect()
    assert len(out) == 1  # only the interior cell has 9 neighbors
    r = out[0]
    assert (r.lap4, r.dxx, r.dyy, r.dxy4) == (0, 0, 0, 0)


def test_focal_curvature_parabola(spark):
    # z = ix^2 -> dxx = 2, dyy = 0, lap4 = 2*dxx = ... lap4 counts
    # E+W+N+S-4C = (dxx + dyy) = 2
    vals = {(ix, iy): ix * ix for ix in range(3) for iy in range(3)}
    df = _grid_cells(spark, 4, vals)
    r = ops_raster.focal_curvature(df, res=4).collect()[0]
    assert (r.dxx, r.dyy, r.lap4, r.dxy4) == (2, 0, 2, 0)


def test_focal_curvature_saddle_cross_term(spark):
    # z = ix*iy -> dxy4 = 4, dxx = dyy = 0
    vals = {(ix, iy): ix * iy for ix in range(3) for iy in range(3)}
    df = _grid_cells(spark, 4, vals)
    r = ops_raster.focal_curvature(df, res=4).collect()[0]
    assert (r.dxx, r.dyy, r.dxy4) == (0, 0, 4)


# ---------------------------------------------------------------------------
# zonal_majority
# ---------------------------------------------------------------------------


def test_zonal_majority_picks_mode(spark):
    rows = [("A", 1)] * 3 + [("A", 2)] * 5 + [("B", 4)] * 2
    df = spark.createDataFrame(rows, ["zone", "cat"])
    out = {r.zone: r for r in ops_crop.zonal_majority(df).collect()}
    assert out["A"].majority == 2 and out["A"].n_major == 5
    assert out["A"].n_zone == 8
    assert out["B"].majority == 4


def test_zonal_majority_tie_breaks_to_smaller_cat(spark):
    rows = [("Z", 3)] * 4 + [("Z", 1)] * 4
    df = spark.createDataFrame(rows, ["zone", "cat"])
    r = ops_crop.zonal_majority(df).collect()[0]
    assert r.majority == 1 and r.n_major == 4
