"""Gate registry extension 42 — entity-analytics batch: RFM scoring
(recency/frequency/monetary against an explicit anchor), top opening
session paths, and per-entity peak-hour diurnal profiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# rfm_scores — anchored at a fixed literal (pure function of data).
# ---------------------------------------------------------------------------

_RFM_ASOF = "2025-01-01 00:00:00"

_RFM_SQL = f"""
    SELECT user_id,
           epoch_us(TIMESTAMP '{_RFM_ASOF}') // 1000000
             - max(epoch_us(ts) // 1000000) AS recency_s,
           count(*) AS frequency,
           CAST(sum(CAST(floor(CAST(value AS DOUBLE) * {G.fnum(1000.0)}
                + {G.fnum(0.5)}) AS BIGINT)) AS BIGINT) AS monetary_q
    FROM events GROUP BY user_id
"""


@gate("rfm_scores", _RFM_SQL)
def q_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_temporal.rfm_scores(ev, asof_ts=_RFM_ASOF)


# ---------------------------------------------------------------------------
# top_session_paths — first-3 event-type journeys.
# ---------------------------------------------------------------------------

_TSP_K = 10
_TSP_D = 3

_TSP_SQL = f"""
    WITH ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= {_TSP_D} GROUP BY user_id
    )
    SELECT path, count(*) AS n_keys
    FROM paths GROUP BY path
    ORDER BY n_keys DESC, path ASC LIMIT {_TSP_K}
"""


@gate("top_session_paths", _TSP_SQL)
def q_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_temporal.top_session_paths(ev, k=_TSP_K, depth=_TSP_D)


# ---------------------------------------------------------------------------
# peak_hour — per-user diurnal argmax.
# ---------------------------------------------------------------------------

_PH_SQL = f"""
    WITH cnt AS (
      SELECT user_id, hour(ts) AS hr, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT user_id, hr, c,
             sum(c) OVER (PARTITION BY user_id) AS n,
             row_number() OVER (
               PARTITION BY user_id ORDER BY c DESC, hr ASC
             ) AS rn
      FROM cnt
    )
    SELECT user_id, CAST(hr AS INT) AS peak_hr, c AS peak_n,
           (c * {1 << 20}) // n AS share_q
    FROM ranked WHERE rn = 1
"""


@gate("peak_hour", _PH_SQL)
def q_peak_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_temporal.peak_hour(ev)

