"""Gate registry extension 60 — terrain-derivative batch (the
gdaldem family over the cell lattice): hillshade and slope/aspect,
both built on the focal_gradient oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _points, gate
from pdal_spark.gates.gate_ext37 import _FO_RES, _fg_sql
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import raster as ops_raster

_HS_AZ, _HS_ALT, _HS_Z = 315.0, 45.0, 0.1


def _cellv(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return (
        ops_h3.h3_encode(pts, "lat", "lon", res=_FO_RES, out="cell")
        .groupBy("cell").agg(F.count(F.lit(1)).alias("x"))
    )


def _hillshade_sql() -> str:
    sh = ops_raster.hillshade_expr(_HS_AZ, _HS_ALT, _HS_Z)
    return f"""
    SELECT cell, round({sh}, 9) AS shade,
           CAST(floor(({sh}) * 255e0 + 0.5e0) AS INT) AS shade255
    FROM ({_fg_sql()}) g
    """


@gate("hillshade", _hillshade_sql())
def q_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.hillshade(
        _cellv(spark, sf_dir), res=_FO_RES,
        azimuth_deg=_HS_AZ, altitude_deg=_HS_ALT, z_scale=_HS_Z,
    )


def _slope_sql() -> str:
    from pdal_spark import sqlgen as G

    k = G.fnum(_HS_Z / 2.0)
    p = f"({k} * cast(gx2 as double))"
    q = f"({k} * cast(gy2 as double))"
    octant = ops_raster.aspect_octant_sql("(-gx2)", "(-gy2)")
    return f"""
    SELECT cell,
           CASE WHEN gx2 IS NULL OR gy2 IS NULL THEN NULL
                ELSE round(sqrt({p} * {p} + {q} * {q}), 9)
           END AS slope_tan,
           CAST({octant} AS INT) AS octant
    FROM ({_fg_sql()}) g
    """


@gate("slope_aspect", _slope_sql())
def q_slope_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.slope_aspect(
        _cellv(spark, sf_dir), res=_FO_RES, z_scale=_HS_Z,
    )
