"""Gate registry extension 132 — interop batch: Open Location Code
(Plus Codes) 10-character encode."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _points, gate
from pdal_spark.operators import h3 as ops_h3

_OL_A = ops_h3.OLC_ALPHABET
_OL_LAT = G.geo_lat("event_id")
_OL_LON = G.geo_lon("event_id")
_OL_LATV = (
    f"least(cast(floor((({_OL_LAT}) + 90.0e0) * 8000.0e0)"
    " as bigint), 1439999)"
)
_OL_LONV = (
    f"cast(floor(((({_OL_LON}) + 180.0e0)"
    f" - 360.0e0 * floor((({_OL_LON}) + 180.0e0) / 360.0e0))"
    " * 8000.0e0) as bigint)"
)


def _olc_sql() -> str:
    parts = []
    for i in range(5):
        shift = 20 ** (4 - i)
        for v in ("la", "lo"):
            parts.append(
                f"substring('{_OL_A}',"
                f" cast(({v} // {shift}) % 20 as int) + 1, 1)"
            )
        if i == 3:
            parts.append("'+'")
    code = "concat(" + ", ".join(parts) + ")"
    return f"""
    WITH q AS MATERIALIZED (
      SELECT event_id, {_OL_LATV} AS la, {_OL_LONV} AS lo
      FROM events
    )
    SELECT event_id, {code} AS olc FROM q
    """


@gate("olc_encode", _olc_sql())
def q_olc_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return ops_h3.olc_encode(pts).select("event_id", "olc")
