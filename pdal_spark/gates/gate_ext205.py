"""Gate registry extension 205 — co-movement batch: rolling
correlation and residual Durbin-Watson."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_RC_W = 20
_RC_X = "CAST(floor(value) AS BIGINT)"
_RC_Y = (
    f"(CAST(floor(value) AS BIGINT)"
    f" + CAST({G.lehmer2('event_id')} % 25 AS BIGINT))"
)
_RC_NUM = (
    "(cast(n as double) * cast(sxy as double)"
    " - cast(sx as double) * cast(sy as double))"
)
_RC_DX = (
    "(cast(n as double) * cast(sxx as double)"
    " - cast(sx as double) * cast(sx as double))"
)
_RC_DY = (
    "(cast(n as double) * cast(syy as double)"
    " - cast(sy as double) * cast(sy as double))"
)
_RC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 4 AS k, event_id AS o,
             {_RC_X} AS xv, {_RC_Y} AS yv
      FROM events
    ),
    m AS (
      SELECT k, o,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(xv) OVER w AS BIGINT) AS sx,
             CAST(sum(yv) OVER w AS BIGINT) AS sy,
             CAST(sum(xv * yv) OVER w AS BIGINT) AS sxy,
             CAST(sum(xv * xv) OVER w AS BIGINT) AS sxx,
             CAST(sum(yv * yv) OVER w AS BIGINT) AS syy
      FROM s
      WINDOW w AS (PARTITION BY k ORDER BY o ASC
        ROWS BETWEEN {_RC_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT k, o,
           CASE WHEN n >= {_RC_W} AND {_RC_DX} > 0.0e0
             AND {_RC_DY} > 0.0e0 THEN
             round({_RC_NUM} / sqrt({_RC_DX} * {_RC_DY}), 9) END
             AS r_roll
    FROM m
"""


@gate("rolling_corr", _RC_SQL)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("k"),
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("xv"),
        F.expr(
            f"cast(floor(value) as bigint)"
            f" + cast({G.lehmer2('event_id')} % 25 as bigint)"
        ).alias("yv"),
    )
    return ops_temporal.rolling_corr(
        ev, key="k", order="o", x="xv", y="yv", window_n=_RC_W
    )


# residual DW on a TINY slice (the int64 residual bound)
_RD_PRED = "event_id % 199 = 0"
_RD_X = "(event_id % 7)"
_RD_Y = f"(event_id % 7 + CAST({G.lehmer2('event_id')} % 3 AS BIGINT))"
_RD_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST({_RD_X} AS BIGINT) AS xv,
             CAST({_RD_Y} AS BIGINT) AS yv
      FROM events WHERE {_RD_PRED}
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xv) AS BIGINT) AS sx,
             CAST(sum(yv) AS BIGINT) AS sy,
             CAST(count(*) * sum(xv * yv)
               - sum(xv) * sum(yv) AS BIGINT) AS num,
             CAST(count(*) * sum(xv * xv)
               - sum(xv) * sum(xv) AS BIGINT) AS den
      FROM s
    ),
    res AS (
      SELECT o, n, num, den,
             CAST(n * den * yv - n * num * xv
               - (den * sy - num * sx) AS BIGINT) AS e
      FROM s, mom
    ),
    lagged AS (
      SELECT n, num, den, e,
             lag(e, 1) OVER (ORDER BY o ASC) AS pe
      FROM res
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST(max(num) AS BIGINT) AS num,
           CAST(max(den) AS BIGINT) AS den,
           CASE WHEN sum(e * e) > 0 THEN
             cast(sum(CASE WHEN pe IS NOT NULL
               THEN (e - pe) * (e - pe) END) as double)
             / cast(sum(e * e) as double) END AS dw
    FROM lagged
"""


@gate("residual_dw", _RD_SQL)
def q_residual_dw(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_RD_PRED).select(
        F.col("event_id").alias("o"),
        F.expr("cast(event_id % 7 as bigint)").alias("xv"),
        F.expr(
            f"cast(event_id % 7 as bigint)"
            f" + cast({G.lehmer2('event_id')} % 3 as bigint)"
        ).alias("yv"),
    )
    return ops_temporal.residual_dw(ev, order="o", x="xv", y="yv")
