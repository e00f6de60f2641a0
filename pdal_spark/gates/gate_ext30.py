"""Gate registry extension 30 — crawler-operations batch: per-host
politeness schedule (fetch slots + time offsets), inter-event
burstiness (the bot-vs-human timing signature), and great-circle leg
bearings (the navigation complement of trajectory_stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext7 import _URL_SQL
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import temporal as ops_temporal
from pdal_spark.operators import textops as ops_text

# ---------------------------------------------------------------------------
# crawl_schedule — slots within host, deterministic (url, id) order.
# ---------------------------------------------------------------------------

_CS_DELAY = 700
_CS_HOST = (
    "lower(regexp_extract(url,"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1))"
)

_CS_SQL = f"""
    WITH pages AS MATERIALIZED (
      SELECT event_id AS doc_id, {_URL_SQL} AS url FROM events
    )
    SELECT doc_id, {_CS_HOST} AS host,
           CAST(row_number() OVER (
             PARTITION BY {_CS_HOST} ORDER BY url ASC, doc_id ASC
           ) - 1 AS INT) AS slot,
           (row_number() OVER (
             PARTITION BY {_CS_HOST} ORDER BY url ASC, doc_id ASC
           ) - 1) * CAST({_CS_DELAY} AS BIGINT) AS t_offset_ms
    FROM pages
"""


@gate("crawl_schedule", _CS_SQL)
def q_crawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pages = ev.select(
        F.col("event_id").alias("doc_id"),
        F.concat(
            F.lit("https://site-"),
            (F.col("event_id") % 1000).cast("string"),
            F.lit(".example.com/page/"),
            F.col("event_id").cast("string"),
        ).alias("url"),
    )
    return ops_text.crawl_schedule(pages, delay_ms=_CS_DELAY)


# ---------------------------------------------------------------------------
# burstiness — per-user gap CV signature.
# ---------------------------------------------------------------------------

_BU_MU = "(CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))"
_BU_VAR = (
    "(CAST(n_gaps AS DOUBLE) * CAST(ss AS DOUBLE)"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
    " / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE))"
)
_BU_SD = f"sqrt({_BU_VAR})"

_BU_SQL = f"""
    WITH gaps AS MATERIALIZED (
      SELECT user_id,
             epoch_us(ts) // 1000000
               - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 )) // 1000000 AS g
      FROM events
    ),
    mom AS (
      SELECT user_id, count(*) AS n_gaps, sum(g) AS s,
             sum(g * g) AS ss
      FROM gaps WHERE g IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_gaps, s, ss,
           CASE WHEN n_gaps >= 2 AND {_BU_SD} + {_BU_MU} > 0.0e0 THEN
             ({_BU_SD} - {_BU_MU}) / ({_BU_SD} + {_BU_MU}) END AS b
    FROM mom
"""


@gate("burstiness", _BU_SQL)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_temporal.burstiness(ev)


# ---------------------------------------------------------------------------
# trajectory_bearings — per-leg initial bearing, rounded(6).
# ---------------------------------------------------------------------------

_TB_RAD = G.fnum(G.RAD)
_TB_DEG = G.fnum(G.DEG)
_TB_DL = f"((x1 - x0) * {_TB_RAD})"
_TB_P1, _TB_P2 = f"(y0 * {_TB_RAD})", f"(y1 * {_TB_RAD})"
_TB_TH = (
    f"atan2(sin({_TB_DL}) * cos({_TB_P2}),"
    f" cos({_TB_P1}) * sin({_TB_P2})"
    f" - sin({_TB_P1}) * cos({_TB_P2}) * cos({_TB_DL}))"
)

_TB_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT user_id, event_id, ts,
             {G.geo_lat('event_id')} AS lat,
             {G.geo_lon('event_id')} AS lon
      FROM events
    ),
    legs AS (
      SELECT user_id, event_id,
             lat AS y0, lon AS x0,
             lead(lat) OVER w AS y1, lead(lon) OVER w AS x1
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT user_id, event_id,
           round(((({_TB_TH}) * {_TB_DEG}) + {G.fnum(360.0)})
             % {G.fnum(360.0)}, 6) AS bearing
    FROM legs WHERE y1 IS NOT NULL
"""


@gate("trajectory_bearings", _TB_SQL)
def q_trajectory_bearings(spark: SparkSession, sf_dir: str
                          ) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_temporal.trajectory_bearings(pts)

