"""Gate registry extension 101 — areal-weighted zone interpolation,
Kaplan-Meier survival curve, direct geodesic destination."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import overlay as ops_overlay
from pdal_spark.operators import temporal as ops_temporal
from pdal_spark.operators import transform as ops_transform

# deterministic compact rectangles: centre = the user-id geocode,
# half-width from the id (2..14 degrees in millidegrees)
_AZ_LON = G.geo_lon("zid")
_AZ_LAT = G.geo_lat("zid")


def _zone_sql(id_expr: str, shift: int) -> str:
    lon = G.geo_lon(f"({id_expr}) * 31 + {shift}")
    lat = G.geo_lat(f"({id_expr}) * 31 + {shift}")
    w = f"((({id_expr}) % 13 + 2) * 1000)"
    return (
        f"CAST(floor(({lon}) * 1000.0 + 0.5) AS BIGINT) - {w} AS x0,"
        f" CAST(floor(({lon}) * 1000.0 + 0.5) AS BIGINT) + {w} AS x1,"
        f" CAST(floor(({lat}) * 1000.0 + 0.5) AS BIGINT) - {w} AS y0,"
        f" CAST(floor(({lat}) * 1000.0 + 0.5) AS BIGINT) + {w} AS y1"
    )


_AI_CELL = 20000.0

_AI_SQL = f"""
    WITH src AS MATERIALIZED (
      SELECT user_id AS sid, {_zone_sql('user_id', 0)},
             CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY user_id
    ),
    tgt AS MATERIALIZED (
      SELECT DISTINCT user_id % 41 AS tid,
             {_zone_sql('user_id % 41', 7)}
      FROM events
    ),
    pairs AS (
      SELECT s.sid, t.tid, s.v,
             (s.x1 - s.x0) * (s.y1 - s.y0) AS s_area,
             (least(s.x1, t.x1) - greatest(s.x0, t.x0))
             * (least(s.y1, t.y1) - greatest(s.y0, t.y0)) AS ov
      FROM src s JOIN tgt t
        ON s.x0 <= t.x1 AND t.x0 <= s.x1
       AND s.y0 <= t.y1 AND t.y0 <= s.y1
    )
    SELECT tid, CAST(count(*) AS BIGINT) AS n_src,
           CAST(sum((v * ov) // s_area) AS BIGINT) AS allocated_q
    FROM pairs WHERE ov > 0 AND s_area > 0
    GROUP BY tid
"""


def _zones_spark(ev: DataFrame, id_expr, shift: int,
                 idname: str) -> DataFrame:
    zid = id_expr.alias("zid")
    base = ev.select(zid).distinct()
    lon = G.geo_lon(f"(zid) * 31 + {shift}")
    lat = G.geo_lat(f"(zid) * 31 + {shift}")
    w = "((zid % 13 + 2) * 1000)"
    return base.select(
        F.col("zid").alias(idname),
        F.expr(f"CAST(floor(({lon}) * 1000.0e0 + 0.5e0) AS BIGINT)"
               f" - {w}").alias("x0"),
        F.expr(f"CAST(floor(({lon}) * 1000.0e0 + 0.5e0) AS BIGINT)"
               f" + {w}").alias("x1"),
        F.expr(f"CAST(floor(({lat}) * 1000.0e0 + 0.5e0) AS BIGINT)"
               f" - {w}").alias("y0"),
        F.expr(f"CAST(floor(({lat}) * 1000.0e0 + 0.5e0) AS BIGINT)"
               f" + {w}").alias("y1"),
    )


@gate("areal_interp", _AI_SQL)
def q_areal_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("value_q")
    )
    src = _zones_spark(ev, F.col("user_id"), 0, "sid").join(
        counts.select(F.col("user_id").alias("sid"), "value_q"),
        on="sid",
    )
    tgt = _zones_spark(ev, F.col("user_id") % 41, 7, "tid")
    return ops_overlay.areal_interpolate(
        src, tgt, cell=_AI_CELL, value="value_q",
        id_src="sid", id_tgt="tid",
    )


# ---------------------------------------------------------------------------
# kaplan_meier — survival of user activity spans (duration = first->
# last event in hours; event = the span ended on an error, else
# censored)
# ---------------------------------------------------------------------------
_KM_SQL = """
    WITH subj AS MATERIALIZED (
      SELECT user_id,
             CAST((epoch_us(max(ts)) - epoch_us(min(ts)))
                  // 3600000000 AS BIGINT) AS t,
             max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS e
      FROM events GROUP BY user_id
    ),
    per_t AS (
      SELECT t, CAST(count(*) AS BIGINT) AS leave,
             CAST(sum(e) AS BIGINT) AS d
      FROM subj GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             CAST(sum(leave) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_risk
      FROM per_t
    ),
    ev AS (
      SELECT t, n_risk, d,
             CAST(floor(round(ln(1.0 - CAST(d AS DOUBLE)
                  / CAST(n_risk AS DOUBLE)), 9) * 1.0e9 + 0.5)
               AS BIGINT) AS lt
      FROM risk WHERE d > 0 AND d < n_risk
    )
    SELECT t, n_risk, d AS d_events,
           round(exp(CAST(sum(lt) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) / 1.0e9), 6) AS s_r
    FROM ev ORDER BY t
"""


@gate("kaplan_meier", _KM_SQL)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    subj = ev.groupBy("user_id").agg(
        ((F.unix_micros(F.max("ts").cast("timestamp"))
          - F.unix_micros(F.min("ts").cast("timestamp")))
         / F.lit(3_600_000_000)).cast("long").alias("dur_h"),
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("ended_error"),
    )
    return ops_temporal.kaplan_meier(
        subj, duration="dur_h", event="ended_error"
    )


# ---------------------------------------------------------------------------
# geodesic_destination — dead-reckoning projection of every event
# point along bearing (event_id % 360) for `value` km
# ---------------------------------------------------------------------------
_GD_RAD = G.fnum(3.141592653589793 / 180.0)
_GD_DEG = G.fnum(180.0 / 3.141592653589793)
_GD_LAT = G.geo_lat("event_id")
_GD_LON = G.geo_lon("event_id")
_GD_P1 = f"(({_GD_LAT}) * {_GD_RAD})"
_GD_TH = f"((event_id % 360) * {_GD_RAD})"
_GD_D = f"(value / {G.fnum(6371.0088)})"
_GD_SP2 = (
    f"(sin({_GD_P1}) * cos({_GD_D})"
    f" + cos({_GD_P1}) * sin({_GD_D}) * cos({_GD_TH}))"
)
_GD_LAT2 = (
    f"(asin(greatest(least({_GD_SP2}, {G.fnum(1.0)}),"
    f" {G.fnum(-1.0)})) * {_GD_DEG})"
)
_GD_LAM2 = (
    f"(({_GD_LON}) + atan2(sin({_GD_TH}) * sin({_GD_D})"
    f" * cos({_GD_P1}),"
    f" cos({_GD_D}) - sin({_GD_P1}) * {_GD_SP2}) * {_GD_DEG})"
)
_GD_LON2 = (
    f"({_GD_LAM2} - {G.fnum(360.0)}"
    f" * floor((({_GD_LAM2}) + {G.fnum(180.0)}) / {G.fnum(360.0)}))"
)

_GD_SQL = f"""
    SELECT event_id,
           round({_GD_LAT2}, 6) AS lat2,
           round({_GD_LON2}, 6) AS lon2
    FROM events
"""


@gate("geodesic_destination", _GD_SQL)
def q_geodesic_destination(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    from pdal_spark.operators import h3 as ops_h3

    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id").select(
        "event_id", "lat", "lon",
        (F.col("event_id") % 360).cast("double").alias("bearing"),
        F.col("value").alias("dist_km"),
    )
    return ops_transform.geodesic_destination(pts).select(
        "event_id", "lat2", "lon2"
    )
