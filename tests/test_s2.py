"""S2-analog cell encoding + Hilbert key (operators/s2.py).

Validates the structural invariants real S2 relies on (the reference
capability being the filters.h3 cell-encode stage pattern,
filters/H3Filter.cpp:96-130, re-done with the S2 id scheme):
bijective Hilbert curve with unit-step adjacency, parent-prefix
hierarchy, sentinel subtree ranges, face decomposition; plus
engine-vs-oracle equality on the geocoded points.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gates.gate_ext6 import _s2_py
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import s2 as ops_s2

SF_SMOKE = "/root/testdata/sf0.001"


def xy2d(level: int, x: int, y: int) -> int:
    """Serial reference for the hilbert_steps recurrence."""
    d = 0
    x %= 1 << level
    y %= 1 << level
    for k in range(level - 1, -1, -1):
        s = 1 << k
        rx, ry = x // s, y // s
        d += s * s * (3 * rx + ry - 2 * rx * ry)
        xl, yl = x % s, y % s
        if ry == 1:
            x, y = xl, yl
        elif rx == 1:
            x, y = s - 1 - yl, s - 1 - xl
        else:
            x, y = yl, xl
    return d


def test_hilbert_bijective_adjacent_hierarchical():
    for level in (1, 2, 3, 4):
        n = 1 << level
        seen = {}
        for x in range(n):
            for y in range(n):
                seen[xy2d(level, x, y)] = (x, y)
        assert len(seen) == n * n  # bijective onto [0, 4^level)
        for d in range(n * n - 1):
            (x1, y1), (x2, y2) = seen[d], seen[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1  # unit steps
    # parent-prefix: d(level)//4 == d(level-1) of the parent cell —
    # what makes s2_parent pure integer arithmetic
    for x in range(16):
        for y in range(16):
            assert xy2d(4, x, y) // 4 == xy2d(3, x // 2, y // 2)


def test_hilbert_steps_sql_matches_serial():
    level = 6
    steps = G.hilbert_steps("h", "ix", "iy", level, G.DUCKDB)
    base = (
        "SELECT ix, iy FROM (SELECT (range % 64) AS ix,"
        " ((range * 7) % 64) AS iy FROM range(512))"
    )
    sql = G.nested_steps_sql(base, steps, "ix, iy, h_d")
    for ix, iy, d in duckdb.sql(sql).fetchall():
        assert d == xy2d(level, ix, iy)


def test_s2_engine_matches_oracle_and_python(spark):
    level = 10
    pts = ops_h3.geocode(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet"), "event_id"
    )
    enc = ops_s2.s2_encode(pts, "lat", "lon", level=level)
    rows = enc.select("event_id", "lat", "lon", "s2_cell").collect()
    assert rows
    faces = set()
    for r in rows:
        assert r.s2_cell == _s2_py(r.lat, r.lon, level)
        faces.add(r.s2_cell >> G.S2_FACE_SHIFT)
    assert faces == {0, 1, 2, 3, 4, 5}  # all cube faces exercised


def test_s2_parent_contains_children(spark):
    level, plevel = 10, 3
    pts = ops_h3.geocode(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet"), "event_id"
    )
    enc = ops_s2.s2_encode(pts, "lat", "lon", level=level)
    par = ops_s2.s2_parent(enc, "s2_cell", level, plevel, out="p")
    sent = 1 << (G.S2_FACE_SHIFT - 1 - 2 * plevel)
    # every child id lies inside the parent's sentinel range, and the
    # BETWEEN predicate reproduces exact subtree membership
    bad = par.where(
        ~F.col("s2_cell").between(
            F.col("p") - sent + 1, F.col("p") + sent - 1
        )
    ).count()
    assert bad == 0
    # distinct parents of the same face share the face bits
    for r in par.select("s2_cell", "p").limit(50).collect():
        assert r.p >> G.S2_FACE_SHIFT == r.s2_cell >> G.S2_FACE_SHIFT


def test_s2_range_scan_prunes_with_sort(spark):
    """Hilbert ordering gives contiguous id ranges: a subtree query
    on an s2-sorted layout touches one contiguous id span (the
    physical-layout argument for using s2_cell as sort key)."""
    level = 8
    pts = ops_h3.geocode(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet"), "event_id"
    )
    enc = ops_s2.s2_encode(pts, "lat", "lon", level=level)
    anc = _s2_py(10.0, 20.0, 2)
    pred = ops_s2.s2_range_contains("s2_cell", anc, 2)
    inside = enc.where(F.expr(pred))
    # oracle: recompute membership by re-encoding at level 2
    lvl2 = ops_s2.s2_encode(pts, "lat", "lon", level=2, out="c2")
    expect = lvl2.where(F.col("c2") == anc).count()
    assert inside.count() == expect


def test_hilbert_clustering_beats_morton():
    """The reason hilbert_encode exists as an alternative sort key:
    a rectangular window query over a Hilbert-sorted layout touches
    fewer contiguous key ranges (= fewer parquet row-group seeks /
    Iceberg scan tasks) than over a Morton-sorted one (Moon et al.
    2001, clustering property of the Hilbert curve). Exhaustive over
    a 64x64 grid, three window sizes."""

    def morton(x: int, y: int) -> int:
        r = 0
        for b in range(16):
            r |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return r

    def runs(keys: list[int]) -> int:
        ks = sorted(keys)
        return 1 + sum(1 for a, b in zip(ks, ks[1:]) if b != a + 1)

    level, n = 6, 64
    htot = mtot = cnt = 0
    for w in (4, 7, 11):
        for ox in range(0, n - w, 5):
            for oy in range(0, n - w, 5):
                cells = [(ox + i, oy + j) for i in range(w) for j in range(w)]
                htot += runs([xy2d(level, x, y) for x, y in cells])
                mtot += runs([morton(x, y) for x, y in cells])
                cnt += 1
    assert htot < mtot  # measured ~7.1 vs ~12.4 runs per window
    assert cnt > 300


@pytest.mark.parametrize("level", [0, 30])
def test_s2_level_bounds_rejected(level):
    with pytest.raises(ValueError):
        G.hilbert_steps("h", "x", "y", level if level else 0, G.DUCKDB)


def test_s2_center_roundtrip(spark):
    """Re-encoding a cell's center at the same level returns the same
    cell (center lies strictly inside; the linear face maps are
    monotone, so this pins both directions of the transform)."""
    level = 9
    pts = ops_h3.geocode(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet"), "event_id"
    )
    enc = ops_s2.s2_encode(pts, "lat", "lon", level=level)
    ctr = ops_s2.s2_center(enc, "s2_cell", level=level)
    re_enc = ops_s2.s2_encode(
        ctr, "cell_lat", "cell_lon", level=level, out="s2_cell2"
    )
    bad = re_enc.where(F.col("s2_cell2") != F.col("s2_cell")).count()
    assert bad == 0


def test_cell_pyramid_levels_conserve_total(spark):
    from pdal_spark.operators import h3 as H

    pts = spark.range(0, 500).select(
        ((F.col("id") % 170) - 85.0 + 0.5).alias("lat"),
        ((F.col("id") % 360) - 180.0 + 0.5).alias("lon"),
    )
    pyr = H.cell_pyramid(pts, min_res=1, max_res=5).toPandas()
    # every resolution slice partitions the same 500 points
    sums = pyr.groupby("res")["n_points"].sum()
    assert set(sums.index) == {1, 2, 3, 4, 5}
    assert (sums == 500).all()
    # coarser levels have no more cells than finer ones
    cells = pyr.groupby("res")["cell"].count()
    assert (cells.diff().dropna() >= 0).all()


def test_slippy_quadkey_prefix_property(spark):
    """A tile's quadkey at zoom z has the parent tile's quadkey at
    z-1 as a strict prefix (the property XYZ pyramids are served by).
    """
    from pdal_spark.operators import h3 as H

    pts = spark.range(0, 300).select(
        ((F.col("id") % 140) - 70.0 + 0.25).alias("lat"),
        ((F.col("id") % 360) - 180.0 + 0.25).alias("lon"),
    )
    z6 = H.slippy_encode(pts, zoom=6).select(
        "lat", "lon", F.col("quadkey").alias("qk6")
    )
    z5 = H.slippy_encode(z6, zoom=5).select("qk6", "quadkey")
    pdf = z5.toPandas()
    assert len(pdf) == 300
    assert (pdf["qk6"].str.len() == 6).all()
    assert (pdf["quadkey"].str.len() == 5).all()
    assert all(a.startswith(b) for a, b in zip(pdf["qk6"], pdf["quadkey"]))


def test_slippy_known_tile(spark):
    # lat 0+, lon 0+ at zoom 1 -> tile (1, 0) = quadkey "1"
    pts = spark.createDataFrame([(10.0, 10.0)], "lat double, lon double")
    from pdal_spark.operators import h3 as H

    row = H.slippy_encode(pts, zoom=1).collect()[0]
    assert (row.tile_x, row.tile_y, row.quadkey) == (1, 0, "1")
    # southern hemisphere, western lon -> tile (0, 1) = "2"
    pts2 = spark.createDataFrame([(-10.0, -10.0)], "lat double, lon double")
    row2 = H.slippy_encode(pts2, zoom=1).collect()[0]
    assert (row2.tile_x, row2.tile_y, row2.quadkey) == (0, 1, "2")


def test_slippy_pyramid_levels_conserve_total(spark):
    from pdal_spark.operators import h3 as H

    pts = spark.range(0, 400).select(
        ((F.col("id") % 140) - 70.0 + 0.25).alias("lat"),
        ((F.col("id") % 360) - 180.0 + 0.25).alias("lon"),
    )
    pyr = H.slippy_pyramid(pts, min_zoom=1, max_zoom=5).toPandas()
    sums = pyr.groupby("zoom")["n_points"].sum()
    assert set(sums.index) == {1, 2, 3, 4, 5}
    assert (sums == 400).all()
    # parent counts are sums of their children (morton >> 2)
    z5 = pyr[pyr.zoom == 5].set_index("tile_morton")["n_points"]
    z4 = pyr[pyr.zoom == 4].set_index("tile_morton")["n_points"]
    rolled = z5.groupby(z5.index // 4).sum()
    assert rolled.sort_index().equals(z4.sort_index())


def test_geohash_known_values(spark):
    """Canonical geohashes (the public base-32 grid) come out exactly."""
    from pdal_spark.operators import h3 as H

    pts = spark.createDataFrame(
        [(57.64911, 10.40744), (42.6, -5.6), (39.92324, 116.3906)],
        "lat double, lon double",
    )
    rows = {
        (r.lat, r.lon): r.geohash
        for r in H.geohash_encode(pts, precision=8).collect()
    }
    assert rows[(57.64911, 10.40744)] == "u4pruydq"
    assert rows[(42.6, -5.6)].startswith("ezs42")
    assert rows[(39.92324, 116.3906)] == "wx4g0ec1"


def test_geohash_prefix_property(spark):
    """Geohash is a prefix code: the p-2 hash is a strict prefix of
    the p hash, and the int key coarsens by a plain shift."""
    from pdal_spark.operators import h3 as H

    pts = spark.range(0, 300).select(
        ((F.col("id") % 140) - 70.0 + 0.25).alias("lat"),
        ((F.col("id") % 360) - 180.0 + 0.25).alias("lon"),
    )
    p8 = H.geohash_encode(pts, precision=8).select(
        "lat", "lon",
        F.col("geohash").alias("g8"), F.col("geohash_key").alias("k8"),
    )
    p6 = H.geohash_encode(p8, precision=6)
    pdf = p6.select("g8", "k8", "geohash", "geohash_key").toPandas()
    assert len(pdf) == 300
    assert all(a.startswith(b) for a, b in zip(pdf["g8"], pdf["geohash"]))
    assert (pdf["k8"] // 1024 == pdf["geohash_key"]).all()


def test_geohash_center_in_cell(spark):
    """with_center yields a point that re-encodes to the same cell."""
    from pdal_spark.operators import h3 as H

    pts = spark.range(0, 200).select(
        ((F.col("id") % 140) - 70.0 + 0.37).alias("lat"),
        ((F.col("id") % 360) - 180.0 + 0.61).alias("lon"),
    )
    enc = H.geohash_encode(pts, precision=7, with_center=True).select(
        F.col("geohash").alias("g0"),
        F.col("gh_lat").alias("lat"), F.col("gh_lon").alias("lon"),
    )
    re_enc = H.geohash_encode(enc, precision=7).toPandas()
    assert (re_enc["g0"] == re_enc["geohash"]).all()
