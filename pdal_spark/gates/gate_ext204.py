"""Gate registry extension 204 — robust-anomaly batch: per-season
median/MAD anomaly scores."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_RA_PRED = "event_id % 5 = 0"


def _ra_med2(src: str, col: str, out: str) -> str:
    return f"""
      SELECT s,
             CASE WHEN count(*) = 1 THEN 2 * sum({col})
               ELSE sum({col}) END AS {out}
      FROM (
        SELECT s, {col},
               row_number() OVER (PARTITION BY s
                 ORDER BY {col} ASC) AS rn,
               count(*) OVER (PARTITION BY s) AS nn
        FROM {src}
      ) r
      WHERE rn = (nn + 1) // 2 OR rn = (nn + 2) // 2
      GROUP BY s
    """


_RA_SQL = f"""
    WITH base AS MATERIALIZED (
      SELECT event_id % 12 AS s, event_id AS o,
             CAST(floor(value) AS BIGINT) AS v
      FROM events WHERE {_RA_PRED}
    ),
    med AS MATERIALIZED ({_ra_med2('base', 'v', 'med2')}),
    dev AS MATERIALIZED (
      SELECT base.s, abs(2 * base.v - med.med2) AS d2v
      FROM base JOIN med ON base.s = med.s
    ),
    mad AS MATERIALIZED ({_ra_med2('dev', 'd2v', 'mad2x2')})
    SELECT base.s, base.o, base.v,
           CASE WHEN mad.mad2x2 > 0 THEN
             round(cast(2 * (2 * base.v) - 2 * med.med2
               as double) / cast(mad.mad2x2 as double), 9) END
             AS score_r
    FROM base
    JOIN med ON base.s = med.s
    JOIN mad ON base.s = mad.s
"""


@gate("robust_seasonal_anomaly", _RA_SQL)
def q_robust_seasonal_anomaly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_RA_PRED).select(
        (F.col("event_id") % 12).alias("s"),
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.robust_seasonal_anomaly(
        ev, season="s", order="o", value="v"
    )
