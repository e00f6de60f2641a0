"""Gate registry extension 214 — survey batch: Horvitz-Thompson
total and design effect."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_HT_Q = ops_stats.HT_Q
_HT_NUM = "(1 + event_id % 4)"
_HT_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT CAST(floor(value) AS BIGINT) AS v,
             CAST({_HT_NUM} AS BIGINT) AS num,
             CAST(5 AS BIGINT) AS den
      FROM events WHERE event_id % 3 = 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum((v * den * CAST({_HT_Q} AS BIGINT)) // num)
             AS BIGINT) AS t_q,
           cast(sum((v * den * CAST({_HT_Q} AS BIGINT)) // num)
             as double) / {float(_HT_Q)!r}e0 AS t_hat
    FROM s
"""


@gate("horvitz_thompson", _HT_SQL)
def q_horvitz_thompson(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where("event_id % 3 = 0") \
        .select(
            F.expr("cast(floor(value) as bigint)").alias("v"),
            F.expr(_HT_NUM).cast("long").alias("num"),
            F.lit(5).cast("long").alias("den"),
        )
    return ops_stats.horvitz_thompson(
        ev, value="v", pi_num="num", pi_den="den"
    )


_DE_BQ = "(cast(b_q as double) / 1048576.0e0)"
_DE_NF = "cast(n as double)"
_DE_KF = "cast(k as double)"
_DE_SSB = (
    f"({_DE_BQ} - cast(st as double) * cast(st as double)"
    f" / {_DE_NF})"
)
_DE_SSW = f"(cast(sst as double) - {_DE_BQ})"
_DE_MSB = f"({_DE_SSB} / ({_DE_KF} - 1.0e0))"
_DE_MSW = f"({_DE_SSW} / ({_DE_NF} - {_DE_KF}))"
_DE_MBAR = f"({_DE_NF} / {_DE_KF})"
_DE_RHO = (
    f"(({_DE_MSB} - {_DE_MSW})"
    f" / ({_DE_MSB} + ({_DE_MBAR} - 1.0e0) * {_DE_MSW}))"
)
_DE_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 40 AS c,
             CAST(floor(value) AS BIGINT)
               + (user_id % 40) * 3 AS v
      FROM events
    ),
    grp AS (
      SELECT c, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(v) AS BIGINT) AS s,
             CAST(sum(v * v) AS BIGINT) AS ss
      FROM s GROUP BY c
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(m) AS BIGINT) AS n,
             CAST(sum(s) AS BIGINT) AS st,
             CAST(sum(ss) AS BIGINT) AS sst,
             CAST(sum(((s * s) // m) * CAST(1048576 AS BIGINT)
               + ((s * s) % m) * CAST(1048576 AS BIGINT) // m)
               AS BIGINT) AS b_q
      FROM grp
    )
    SELECT k, n,
           CASE WHEN k > 1 AND n > k AND {_DE_MSW} > 0.0e0
             AND {_DE_MSB} + ({_DE_MBAR} - 1.0e0) * {_DE_MSW}
               > 0.0e0 THEN
             1.0e0 + ({_DE_MBAR} - 1.0e0) * {_DE_RHO} END
             AS deff
    FROM tot
"""


@gate("design_effect", _DE_SQL)
def q_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 40).alias("c"),
        (F.expr("cast(floor(value) as bigint)")
         + (F.col("user_id") % 40) * 3).alias("v"),
    )
    return ops_stats.design_effect(ev, cluster="c", value="v")
