"""Gate registry extension 236 — general transverse Mercator
(PROJ `tmerc`: OSGB/NZTM/Gauss-Krueger national grids). Shared
Karney-series fragment runs identically in both dialects; the OS
published worked example (Caister water tower, OSGB36/Airy 1830)
is pinned reference-independently in tests/test_published_vectors_4."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3

_LAT = f"({G.geo_lat('event_id')})"
_LON = f"({G.geo_lon('event_id')})"

# NZTM2000-style parameters (GRS80, lat0=0, lon0=173, k0=0.9996,
# FE 1600000, FN 10000000)
_ARGS = (0.0, 173.0, 0.9996, 1600000.0, 10000000.0)


def _tm_gate_sql() -> str:
    from pdal_spark.operators.transform import WGS84_A, WGS84_F

    xe, ye = G.tmerc_xy("lat", "lon", *_ARGS, WGS84_A, WGS84_F,
                        G.DUCKDB)
    return f"""
    WITH p AS MATERIALIZED (
      SELECT event_id, {_LAT} AS lat, {_LON} AS lon FROM events
    )
    SELECT event_id, round({xe}, 3) + 0.0e0 AS x_tm,
           round({ye}, 3) + 0.0e0 AS y_tm FROM p
    """


@gate("reproject_tmerc", _tm_gate_sql())
def q_reproject_tmerc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.transform import reproject_tmerc

    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id").select(
        "event_id", "lat", "lon")
    return reproject_tmerc(
        pts, lat0=_ARGS[0], lon0=_ARGS[1], k0=_ARGS[2],
        x0=_ARGS[3], y0=_ARGS[4]).select("event_id", "x_tm", "y_tm")
