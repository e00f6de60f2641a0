"""Gate registry extension 235 — polar stereographic reprojection
(VERDICT r3 'What's missing' #3 residual: the stereographic/polar
grid family). Closed form shared between both dialects; property
pins (standard-parallel radius, independent iterative inverse) in
tests/test_published_vectors_4.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import transform as ops_transform

_LAT = f"({G.geo_lat('event_id')})"
_LON = f"({G.geo_lon('event_id')})"


def _ps_gate_sql() -> str:
    xe, ye = ops_transform.polar_stereographic_sql(
        "lat", "lon", 70.0, -45.0
    )
    return f"""
    WITH p AS MATERIALIZED (
      SELECT event_id, {_LAT} AS lat, {_LON} AS lon FROM events
    )
    SELECT event_id, {xe} AS x_ps, {ye} AS y_ps FROM p
    """


@gate("reproject_polar_stereo", _ps_gate_sql())
def q_reproject_polar_stereo(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """EPSG:3413-style NSIDC Arctic grid (lat_ts=70, lon0=-45) over
    the geocoded pages."""
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id").select(
        "event_id", "lat", "lon")
    return ops_transform.reproject_polar_stereographic(
        pts, lat_ts=70.0, lon0=-45.0).select(
        "event_id", "x_ps", "y_ps")
