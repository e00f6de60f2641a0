"""Gate registry extension 122 — step-series batch: time-weighted
average and per-state duration shares (unique synthetic timestamps
— ties would make `lead` ambiguous)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# time_weighted_avg — gauge value held between events
# ---------------------------------------------------------------------------
_TW_SQL = """
    WITH stepped AS MATERIALIZED (
      SELECT user_id % 23 AS k, event_id * 1000000 AS t,
             event_id % 50 AS v,
             lead(event_id * 1000000) OVER (
               PARTITION BY user_id % 23 ORDER BY event_id) AS tn
      FROM events
    ),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_obs,
             CAST(sum(CASE WHEN tn IS NOT NULL
                      THEN v * (tn - t) ELSE 0 END) AS BIGINT)
               AS vt_sum,
             CAST(max(t) - min(t) AS BIGINT) AS span_us
      FROM stepped GROUP BY k HAVING max(t) - min(t) > 0
    )
    SELECT k AS user_id, n_obs, vt_sum, span_us,
           cast(vt_sum as double) / cast(span_us as double) AS twa
    FROM agg
"""


@gate("time_weighted_avg", _TW_SQL)
def q_time_weighted_avg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 23).alias("k"),
        F.timestamp_micros(
            F.col("event_id") * 1_000_000
        ).alias("tsu"),
        (F.col("event_id") % 50).alias("v"),
    )
    return ops_temporal.time_weighted_avg(
        ev, key="k", ts="tsu", value="v"
    ).select(F.col("k").alias("user_id"), "n_obs", "vt_sum",
             "span_us", "twa")


# ---------------------------------------------------------------------------
# state_durations — time in each event_type between transitions
# ---------------------------------------------------------------------------
_SD2_SQL = """
    WITH stepped AS MATERIALIZED (
      SELECT user_id % 23 AS k, event_id * 1000000 AS t,
             event_type AS s,
             lead(event_id * 1000000) OVER (
               PARTITION BY user_id % 23 ORDER BY event_id) AS tn
      FROM events
    ),
    spans AS (
      SELECT k, CAST(max(t) - min(t) AS BIGINT) AS span_us
      FROM stepped GROUP BY k HAVING max(t) - min(t) > 0
    ),
    durs AS (
      SELECT k, s, CAST(count(*) AS BIGINT) AS n_holds,
             CAST(sum(tn - t) AS BIGINT) AS dur_us
      FROM stepped WHERE tn IS NOT NULL GROUP BY k, s
    )
    SELECT durs.k AS user_id, s AS event_type, n_holds, dur_us,
           span_us,
           cast(dur_us as double) / cast(span_us as double)
             AS share
    FROM durs JOIN spans ON spans.k = durs.k
"""


@gate("state_durations", _SD2_SQL)
def q_state_durations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 23).alias("k"),
        F.timestamp_micros(
            F.col("event_id") * 1_000_000
        ).alias("tsu"),
        F.col("event_type").alias("st"),
    )
    return ops_temporal.state_durations(
        ev, key="k", ts="tsu", state="st"
    ).select(F.col("k").alias("user_id"),
             F.col("st").alias("event_type"),
             "n_holds", "dur_us", "span_us", "share")
