"""Gate registry extension 215 — integrated autocorrelation time
and effective sample size."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_AT_ML = 5
_AT_TERMS = " + ".join(
    f"cast(c{k} as double) / cast(c0 as double)"
    for k in range(1, _AT_ML + 1)
)
_AT_TAU = f"(1.0e0 + 2.0e0 * ({_AT_TERMS}))"
_AT_LAGS = ",\n             ".join(
    f"lag(d, {k}) OVER (ORDER BY o ASC) AS p{k}"
    for k in range(1, _AT_ML + 1)
)
_AT_CS = ",\n             ".join(
    f"CAST(sum(CASE WHEN p{k} IS NOT NULL THEN d * p{k} END)"
    f" AS BIGINT) AS c{k}"
    for k in range(1, _AT_ML + 1)
)
_AT_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(v) AS BIGINT) AS sx FROM s),
    dev AS MATERIALIZED (
      SELECT o, n, CAST(n * v - sx AS BIGINT) AS d
      FROM s, mom
    ),
    lags AS (
      SELECT n, d,
             {_AT_LAGS}
      FROM dev
    ),
    agg AS (
      SELECT n, CAST(sum(d * d) AS BIGINT) AS c0,
             {_AT_CS}
      FROM lags GROUP BY n
    )
    SELECT CAST(n AS BIGINT) AS n, c0,
           CASE WHEN c0 > 0 THEN {_AT_TAU} END AS tau,
           CASE WHEN c0 > 0 AND {_AT_TAU} > 0.0e0 THEN
             cast(n as double) / {_AT_TAU} END AS ess
    FROM agg
"""


@gate("autocorr_time", _AT_SQL)
def q_autocorr_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.autocorr_time(
        ev, order="o", value="v", max_lag=_AT_ML
    )
