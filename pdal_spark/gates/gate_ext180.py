"""Gate registry extension 180 — climate batch: seasonal
standardized anomalies and degree-days."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_SA_PRED = "event_id % 7 = 0"
_SA_MEAN = "(cast(sum_s as double) / cast(n_s as double))"
_SA_SD = (
    "sqrt((cast(n_s as double) * cast(ss_s as double)"
    " - cast(sum_s as double) * cast(sum_s as double))"
    " / (cast(n_s as double) * (cast(n_s as double) - 1.0e0)))"
)
_SA_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id % 12 AS s, event_id AS o,
             CAST(floor(value) AS BIGINT) AS v
      FROM events WHERE {_SA_PRED}
    ),
    mom AS (
      SELECT s, CAST(count(*) AS BIGINT) AS n_s,
             CAST(sum(v) AS BIGINT) AS sum_s,
             CAST(sum(v * v) AS BIGINT) AS ss_s
      FROM s GROUP BY s
    )
    SELECT s.s, s.o, s.v,
           CASE WHEN n_s > 1 AND {_SA_SD} > 0.0e0 THEN
             round((cast(v as double) - {_SA_MEAN}) / {_SA_SD}, 9)
             END AS z_r
    FROM s JOIN mom ON s.s = mom.s
"""


@gate("seasonal_anomaly", _SA_SQL)
def q_seasonal_anomaly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_SA_PRED).select(
        (F.col("event_id") % 12).alias("s"),
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.seasonal_anomaly(
        ev, season="s", order="o", value="v"
    )


_DD_BASE = 180
_DD_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 10 AS k,
             CAST(floor(value) AS BIGINT) AS t
      FROM events
    )
    SELECT k, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(greatest(0, {_DD_BASE} - t)) AS BIGINT)
             AS hdd,
           CAST(sum(greatest(0, t - {_DD_BASE})) AS BIGINT)
             AS cdd
    FROM s GROUP BY k
"""


@gate("degree_days", _DD_SQL)
def q_degree_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("k"),
        F.expr("cast(floor(value) as bigint)").alias("t"),
    )
    return ops_temporal.degree_days(
        ev, key="k", value="t", base_temp=_DD_BASE
    )
