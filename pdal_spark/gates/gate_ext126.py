"""Gate registry extension 126 — navigation/illumination batch:
rhumb-line legs and approximate solar position."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import transform as ops_transform

_RAD = G.fnum(math.pi / 180.0)
_DEG = G.fnum(180.0 / math.pi)

# ---------------------------------------------------------------------------
# rhumb_line — constant-bearing legs between event-derived points
# ---------------------------------------------------------------------------
_RH_MOD = 31
_RH_LAT1 = G.geo_lat("event_id")
_RH_LON1 = G.geo_lon("event_id")
_RH_LAT2 = G.geo_lat("event_id * 7 + 1")
_RH_LON2 = G.geo_lon("event_id * 7 + 1")
_RH_P1 = f"(({_RH_LAT1}) * {_RAD})"
_RH_P2 = f"(({_RH_LAT2}) * {_RAD})"
_RH_DPHI = f"({_RH_P2} - {_RH_P1})"
_RH_DL = (
    f"((({_RH_LON2}) - ({_RH_LON1})) - {G.fnum(360.0)}"
    f" * floor(((({_RH_LON2}) - ({_RH_LON1})) + {G.fnum(180.0)})"
    f" / {G.fnum(360.0)}))"
)
_RH_DLAM = f"({_RH_DL} * {_RAD})"
_RH_QP = G.fnum(math.pi / 4.0)
_RH_DPSI = (
    f"ln(tan({_RH_QP} + {_RH_P2} / 2)"
    f" / tan({_RH_QP} + {_RH_P1} / 2))"
)
_RH_QF = (
    f"(case when {_RH_DPHI} = 0 then cos({_RH_P1})"
    f" else {_RH_DPHI} / ({_RH_DPSI}) end)"
)
_RH_DIST = (
    f"round(sqrt({_RH_DPHI} * {_RH_DPHI}"
    f" + ({_RH_QF}) * ({_RH_QF}) * {_RH_DLAM} * {_RH_DLAM})"
    f" * {G.fnum(6371.0088)}, 6)"
)
_RH_BRAW = f"(atan2({_RH_DLAM}, {_RH_DPSI}) * {_DEG})"
_RH_BRG = (
    f"round({_RH_BRAW} - {G.fnum(360.0)}"
    f" * floor({_RH_BRAW} / {G.fnum(360.0)}), 6)"
)
_RH_SQL = f"""
    SELECT event_id, {_RH_DIST} AS rhumb_km, {_RH_BRG} AS rhumb_brg
    FROM events WHERE event_id % {_RH_MOD} = 0
"""


@gate("rhumb_line", _RH_SQL)
def q_rhumb_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _RH_MOD == 0
    ).select(
        "event_id",
        F.expr(_RH_LAT1).alias("lat1"),
        F.expr(_RH_LON1).alias("lon1"),
        F.expr(_RH_LAT2).alias("lat2"),
        F.expr(_RH_LON2).alias("lon2"),
    )
    return ops_transform.rhumb_line(ev).select(
        "event_id", "rhumb_km", "rhumb_brg"
    )


# ---------------------------------------------------------------------------
# solar_position — per-event illumination geometry
# ---------------------------------------------------------------------------
_SO_LAT = G.geo_lat("event_id")
_SO_LON = G.geo_lon("event_id")
_SO_DOY = "(event_id % 365 + 1)"
_SO_HR = "(cast(event_id % 24 as double))"
_SO_DECL = (
    f"({G.fnum(23.45)} * sin({G.fnum(2.0 * math.pi / 365.0)}"
    f" * (284 + ({_SO_DOY}))))"
)
_SO_HA = (
    f"({G.fnum(15.0)} * (({_SO_HR}) + ({_SO_LON})"
    f" / {G.fnum(15.0)} - {G.fnum(12.0)}))"
)
_SO_COSZ = (
    f"(sin(({_SO_LAT}) * {_RAD}) * sin({_SO_DECL} * {_RAD})"
    f" + cos(({_SO_LAT}) * {_RAD}) * cos({_SO_DECL} * {_RAD})"
    f" * cos({_SO_HA} * {_RAD}))"
)
_SO_SQL = f"""
    SELECT event_id,
           round({_SO_DECL}, 6) + 0.0e0 AS decl_deg,
           round({_SO_HA}, 6) + 0.0e0 AS hour_angle_deg,
           round({_SO_COSZ}, 6) + 0.0e0 AS cos_zenith,
           round(asin(greatest(least({_SO_COSZ}, {G.fnum(1.0)}),
             {G.fnum(-1.0)})) * {_DEG}, 6) + 0.0e0 AS elev_deg
    FROM events
"""


@gate("solar_position", _SO_SQL)
def q_solar_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import h3 as ops_h3

    ev = ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")
    pts = ev.select(
        "event_id", "lat", "lon",
        F.expr(_SO_DOY).alias("doy"),
        F.expr(_SO_HR).alias("hour_utc"),
    )
    return ops_transform.solar_position(pts).select(
        "event_id", "decl_deg", "hour_angle_deg", "cos_zenith",
        "elev_deg",
    )
