"""Gate registry extension 206 — tail-risk batch: historical
VaR/ES and the omega ratio."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_VE_V = "(CAST(floor(value) AS BIGINT) - 245)"
_VE_P = 5
_VE_SQL = f"""
    WITH base AS MATERIALIZED (
      SELECT {_VE_V} AS v,
             CAST(row_number() OVER (ORDER BY floor(value) ASC,
               event_id ASC) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM events
    ),
    tail AS (
      SELECT * FROM base WHERE rn <= ({_VE_P} * n + 99) // 100
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS k_tail,
           CAST(max(v) AS BIGINT) AS var_q,
           CAST(sum(v) AS BIGINT) AS es_num,
           CASE WHEN count(*) > 0 THEN cast(sum(v) as double)
             / cast(count(*) as double) END AS es
    FROM tail
"""


@gate("var_es", _VE_SQL)
def q_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.expr("cast(floor(value) as bigint)") - 245).alias("v")
    )
    return ops_stats.var_es(ev, value="v", pct=_VE_P)


_OM_T = 0
_OM_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_VE_V} AS v FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(greatest(v - {_OM_T}, 0)) AS BIGINT)
             AS gain_sum,
           CAST(sum(greatest({_OM_T} - v, 0)) AS BIGINT)
             AS loss_sum,
           CASE WHEN sum(greatest({_OM_T} - v, 0)) > 0 THEN
             cast(sum(greatest(v - {_OM_T}, 0)) as double)
             / cast(sum(greatest({_OM_T} - v, 0)) as double) END
             AS omega
    FROM s
"""


@gate("omega_ratio", _OM_SQL)
def q_omega_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.expr("cast(floor(value) as bigint)") - 245).alias("v")
    )
    return ops_stats.omega_ratio(ev, value="v", threshold=_OM_T)
