"""Gate registry extension 133 — interop batch 2: Maidenhead grid
locator encode."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _points, gate
from pdal_spark.operators import h3 as ops_h3

_MH_LAT = G.geo_lat("event_id")
_MH_LON = G.geo_lon("event_id")
_MH_LONV = (
    f"least(cast(floor(((({_MH_LON}) + 180.0e0)"
    f" - 360.0e0 * floor((({_MH_LON}) + 180.0e0) / 360.0e0))"
    " * 12.0e0) as bigint), 4319)"
)
_MH_LATV = (
    f"least(cast(floor((({_MH_LAT}) + 90.0e0) * 24.0e0)"
    " as bigint), 4319)"
)
_MH_SQL = f"""
    WITH q AS MATERIALIZED (
      SELECT event_id, {_MH_LONV} AS lo, {_MH_LATV} AS la
      FROM events
    )
    SELECT event_id,
           concat(
             substring('ABCDEFGHIJKLMNOPQR',
               cast(lo // 240 as int) + 1, 1),
             substring('ABCDEFGHIJKLMNOPQR',
               cast(la // 240 as int) + 1, 1),
             cast((lo % 240) // 24 as varchar),
             cast((la % 240) // 24 as varchar),
             substring('abcdefghijklmnopqrstuvwx',
               cast(lo % 24 as int) + 1, 1),
             substring('abcdefghijklmnopqrstuvwx',
               cast(la % 24 as int) + 1, 1)) AS maidenhead
    FROM q
"""


@gate("maidenhead", _MH_SQL)
def q_maidenhead(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_h3.maidenhead_encode(pts).select(
        "event_id", "maidenhead"
    )
