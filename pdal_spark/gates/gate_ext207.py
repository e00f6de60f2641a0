"""Gate registry extension 207 — performance batch: Sharpe/Sortino
and streak statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_SS_V = "(CAST(floor(value) AS BIGINT) - 245)"
_SS_MEAN = "(cast(s as double) / cast(n as double))"
_SS_SD = (
    "sqrt((cast(n as double) * cast(ss as double)"
    " - cast(s as double) * cast(s as double))"
    " / (cast(n as double) * (cast(n as double) - 1.0e0)))"
)
_SS_DSD = (
    "sqrt(cast(dss as double) / (cast(n as double) - 1.0e0))"
)
_SS_SQL = f"""
    WITH s0 AS MATERIALIZED (
      SELECT user_id % 5 AS k, {_SS_V} AS v FROM events
    ),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS s,
             CAST(sum(v * v) AS BIGINT) AS ss,
             CAST(sum(CASE WHEN v < 0 THEN v * v ELSE 0 END)
               AS BIGINT) AS dss
      FROM s0 GROUP BY k
    )
    SELECT k, n, s, ss, dss,
           CASE WHEN n > 1 AND {_SS_SD} > 0.0e0 THEN
             {_SS_MEAN} / {_SS_SD} END AS sharpe,
           CASE WHEN n > 1 AND dss > 0 THEN
             {_SS_MEAN} / {_SS_DSD} END AS sortino
    FROM agg
"""


@gate("sharpe_sortino", _SS_SQL)
def q_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).alias("k"),
        (F.expr("cast(floor(value) as bigint)") - 245).alias("v"),
    )
    return ops_stats.sharpe_sortino(ev, key="k", value="v")


_ST_SQL = f"""
    WITH s0 AS MATERIALIZED (
      SELECT user_id % 5 AS k, event_id AS o, {_SS_V} AS v
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT k, o,
             CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1
               ELSE 0 END AS sgn
      FROM s0
    ),
    flagged AS (
      SELECT k, o, sgn,
             CASE WHEN lag(sgn, 1) OVER (PARTITION BY k
               ORDER BY o ASC) IS NULL
               OR sgn <> lag(sgn, 1) OVER (PARTITION BY k
               ORDER BY o ASC) THEN 1 ELSE 0 END AS brk
      FROM base
    ),
    numbered AS (
      SELECT k, sgn,
             sum(brk) OVER (PARTITION BY k ORDER BY o ASC
               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    ),
    runs AS (
      SELECT k, run_id, CAST(max(sgn) AS BIGINT) AS sgn,
             CAST(count(*) AS BIGINT) AS len
      FROM numbered GROUP BY k, run_id
    )
    SELECT k, CAST(sum(len) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(CASE WHEN sgn = 1 THEN len ELSE 0 END)
             AS BIGINT) AS max_win_streak,
           CAST(max(CASE WHEN sgn = -1 THEN len ELSE 0 END)
             AS BIGINT) AS max_loss_streak
    FROM runs GROUP BY k
"""


@gate("streak_stats", _ST_SQL)
def q_streak_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).alias("k"),
        F.col("event_id").alias("o"),
        (F.expr("cast(floor(value) as bigint)") - 245).alias("v"),
    )
    return ops_stats.streak_stats(
        ev, key="k", order="o", value="v"
    )
