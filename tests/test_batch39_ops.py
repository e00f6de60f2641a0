"""Terrain-derivative batch: hillshade illumination geometry and
aspect octants on a hand-built lattice."""

from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.operators.raster import hillshade, slope_aspect

RES = 6


def _lattice(spark, height_fn):
    """A 5x5 block of adjacent qcells at RES with integer heights."""
    n = 1 << RES
    rows = []
    for dx in range(5):
        for dy in range(5):
            ix, iy = n // 2 + dx, n // 4 + dy
            rows.append((ix, iy, height_fn(dx, dy)))
    df = spark.createDataFrame(rows, "ix long, iy long, x long")
    return df.select(
        F.expr(G.qcell_pack("ix", "iy", RES)).alias("cell"), "x"
    )


def test_hillshade_flat_vs_tilted(spark):
    flat = _lattice(spark, lambda dx, dy: 100)
    out = {r.cell: r for r in hillshade(
        flat, res=RES, z_scale=1.0).collect()}
    import math
    # flat surface: shade = cos(zenith) = sin(45 deg) everywhere the
    # gradient is defined
    vals = [r.shade for r in out.values() if r.shade is not None]
    assert vals and all(
        abs(v - math.sin(math.radians(45))) < 1e-9 for v in vals
    )
    # a slope whose normal points NW (height rising to the SE:
    # +10dx - 10dy) faces the az-315 light and shades BRIGHTER than
    # the opposite tilt
    toward = _lattice(spark, lambda dx, dy: 10 * dx - 10 * dy)
    away = _lattice(spark, lambda dx, dy: -10 * dx + 10 * dy)

    def center_shade(df):
        rows = [r.shade for r in hillshade(
            df, res=RES, z_scale=0.05).collect()
            if r.shade is not None]
        return sum(rows) / len(rows)

    assert center_shade(toward) > center_shade(away)


def test_slope_aspect_octants(spark):
    # height increases east -> steepest descent points WEST (4)
    east_up = _lattice(spark, lambda dx, dy: 10 * dx)
    out = [r for r in slope_aspect(
        east_up, res=RES, z_scale=1.0).collect()
        if r.octant is not None]
    assert out and all(r.octant == 4 for r in out)
    assert all(abs(r.slope_tan - 10.0) < 1e-9 for r in out)
    # flat -> NULL octant, zero slope
    flat = _lattice(spark, lambda dx, dy: 7)
    rows = [r for r in slope_aspect(flat, res=RES).collect()
            if r.slope_tan is not None]
    assert rows and all(
        r.slope_tan == 0.0 and r.octant is None for r in rows
    )
