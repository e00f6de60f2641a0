"""Gate registry extension 145 — attribution batch: positional
multi-touch shares and time-decay credit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_AT_Q = ops_temporal.ATTR_Q

_AS_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id AS u, event_id AS o, event_type AS ch
      FROM events
    ),
    t AS (
      SELECT ch,
             CAST(row_number() OVER (PARTITION BY u ORDER BY o ASC)
               AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY u) AS BIGINT) AS len
      FROM s
    ),
    credited AS (
      SELECT ch,
             CASE WHEN rn = 1 THEN 1 ELSE 0 END AS is_first,
             CASE WHEN rn = len THEN 1 ELSE 0 END AS is_last,
             CAST({_AT_Q} AS BIGINT) // len AS lin_q,
             CASE WHEN len = 1 THEN CAST({_AT_Q} AS BIGINT)
               WHEN len = 2 THEN CAST({_AT_Q} AS BIGINT) // 2
               WHEN rn = 1 OR rn = len
                 THEN (2 * CAST({_AT_Q} AS BIGINT)) // 5
               ELSE (CAST({_AT_Q} AS BIGINT) // 5) // (len - 2)
               END AS pos_q
      FROM t
    )
    SELECT ch, CAST(sum(is_first) AS BIGINT) AS n_first,
           CAST(sum(is_last) AS BIGINT) AS n_last,
           CAST(sum(lin_q) AS BIGINT) AS linear_q,
           CAST(sum(pos_q) AS BIGINT) AS position_q
    FROM credited GROUP BY ch
"""


@gate("attribution_shares", _AS_SQL)
def q_attribution_shares(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_temporal.attribution_shares(
        ev, user="user_id", order="event_id", channel="event_type"
    )


_TD_HL = 50
_TD_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id AS u, CAST(event_id AS BIGINT) AS o,
             event_type AS ch
      FROM events
    ),
    t AS (
      SELECT ch,
             CAST({_AT_Q} AS BIGINT) >> least(
               (max(o) OVER (PARTITION BY u) - o) // {_TD_HL}, 40)
               AS wgt,
             u, o
      FROM s
    ),
    t2 AS (
      SELECT ch, wgt,
             CAST(sum(wgt) OVER (PARTITION BY u) AS BIGINT)
               AS w_path
      FROM t
    )
    SELECT ch, CAST(sum(wgt) AS BIGINT) AS w_raw,
           CAST(sum((wgt * CAST({_AT_Q} AS BIGINT)) // w_path)
             AS BIGINT) AS share_q
    FROM t2 GROUP BY ch
"""


@gate("time_decay_attribution", _TD_SQL)
def q_time_decay_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_temporal.time_decay_attribution(
        ev, user="user_id", order="event_id",
        channel="event_type", halflife=_TD_HL,
    )
