"""Gate registry extension 38 — movement & privacy-aggregation batch:
trajectory odometer (cumulative path + progress fraction), space-time
cube counts, and k-anonymity small-cell suppression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import hexbin as ops_hexbin
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# trajectory_progress — odometer per event.
# ---------------------------------------------------------------------------

_TP_LEG = (
    "CAST(floor("
    + G.haversine_m("plat", "plon", "lat", "lon")
    + f" * {G.fnum(1000.0)} + {G.fnum(0.5)}) AS BIGINT)"
)

_TP_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT user_id, event_id, ts,
             {G.geo_lat('event_id')} AS lat,
             {G.geo_lon('event_id')} AS lon
      FROM events
    ),
    legs AS (
      SELECT user_id, event_id, ts, lat, lon,
             lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    cum AS (
      SELECT user_id, event_id,
             sum(coalesce({_TP_LEG}, 0)) OVER w AS cum_mm,
             sum(coalesce({_TP_LEG}, 0))
               OVER (PARTITION BY user_id) AS total_mm
      FROM legs
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT user_id, event_id, cum_mm, total_mm,
           CASE WHEN total_mm > 0 THEN
             (cum_mm * {1 << 20}) // total_mm END AS frac_q
    FROM cum
"""


@gate("trajectory_progress", _TP_SQL)
def q_trajectory_progress(spark: SparkSession, sf_dir: str
                          ) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_temporal.trajectory_progress(pts)


# ---------------------------------------------------------------------------
# spacetime_counts — res-5 cells x 1-day buckets.
# ---------------------------------------------------------------------------

_ST_RES = 5
_ST_BUCKET = 86400

_ST_SQL = f"""
    SELECT {G.qcell(G.geo_lat('event_id'), G.geo_lon('event_id'),
                    _ST_RES)} AS cell,
           epoch_us(ts) // 1000000 // {_ST_BUCKET} AS t_bucket,
           count(*) AS n
    FROM events GROUP BY 1, 2
"""


@gate("spacetime_counts", _ST_SQL)
def q_spacetime_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_hexbin.spacetime_counts(
        pts, res=_ST_RES, bucket_s=_ST_BUCKET
    )


# ---------------------------------------------------------------------------
# suppress_small_cells — k-anonymity release at res 5, k = 3.
# ---------------------------------------------------------------------------

_SC_RES = 5
_SC_K = 3

_SC_SQL = f"""
    SELECT {G.qcell(G.geo_lat('event_id'), G.geo_lon('event_id'),
                    _SC_RES)} AS cell,
           count(*) AS n_points,
           count(DISTINCT user_id) AS n_entities
    FROM events GROUP BY 1
    HAVING count(DISTINCT user_id) >= {_SC_K}
"""


@gate("suppress_small_cells", _SC_SQL)
def q_suppress_small_cells(spark: SparkSession, sf_dir: str
                           ) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_hexbin.suppress_small_cells(pts, res=_SC_RES, k=_SC_K)

