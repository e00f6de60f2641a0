"""Gate registry extension 226 — experiment-health batch: SRM
check and SMD balance."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_SR_Q = ops_stats.SRM_Q
_SR_ARM = f"(CAST({G.lehmer2('event_id')} % 3 AS BIGINT))"
_SR_SQL = f"""
    WITH per AS MATERIALIZED (
      SELECT {_SR_ARM} AS a, CAST(count(*) AS BIGINT) AS o,
             CAST(1 AS BIGINT) AS w
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(sum(w) AS BIGINT) AS sw,
             CAST(count(*) AS BIGINT) AS k
      FROM per
    ),
    agg AS (
      SELECT n, k,
             CAST(sum((((o * sw - n * w) * (o * sw - n * w))
               // (n * w * sw)) * CAST({_SR_Q} AS BIGINT)
               + (((o * sw - n * w) * (o * sw - n * w))
               % (n * w * sw)) * CAST({_SR_Q} AS BIGINT)
               // (n * w * sw)) AS BIGINT) AS chi2_q
      FROM per, tot GROUP BY n, k
    )
    SELECT n, k, chi2_q,
           cast(chi2_q as double) / {float(_SR_Q)!r}e0 AS chi2
    FROM agg
"""


@gate("srm_check", _SR_SQL)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(
            f"cast({G.lehmer2('event_id')} % 3 as bigint)"
        ).alias("a")
    )
    return ops_stats.srm_check(ev, arm="a")


_SB_ARM = "(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)"
_SB_COV = "CAST(floor(value) AS BIGINT)"


def _sb_mv(k: int) -> tuple[str, str]:
    m = f"(cast(s{k} as double) / cast(n{k} as double))"
    v = (
        f"((cast(n{k} as double) * cast(ss{k} as double)"
        f" - cast(s{k} as double) * cast(s{k} as double))"
        f" / (cast(n{k} as double)"
        f" * (cast(n{k} as double) - 1.0e0)))"
    )
    return m, v


_SB_M0, _SB_V0 = _sb_mv(0)
_SB_M1, _SB_V1 = _sb_mv(1)
_SB_POOL = f"sqrt(({_SB_V1} + {_SB_V0}) / 2.0e0)"
_SB_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_SB_ARM} AS g, {_SB_COV} AS v FROM events
    ),
    agg AS (
      SELECT
        CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n0,
        CAST(sum(CASE WHEN g = 0 THEN v ELSE 0 END) AS BIGINT)
          AS s0,
        CAST(sum(CASE WHEN g = 0 THEN v * v ELSE 0 END)
          AS BIGINT) AS ss0,
        CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n1,
        CAST(sum(CASE WHEN g = 1 THEN v ELSE 0 END) AS BIGINT)
          AS s1,
        CAST(sum(CASE WHEN g = 1 THEN v * v ELSE 0 END)
          AS BIGINT) AS ss1
      FROM s
    )
    SELECT n0, n1,
           CASE WHEN n0 > 1 AND n1 > 1 AND {_SB_POOL} > 0.0e0
             THEN ({_SB_M1} - {_SB_M0}) / {_SB_POOL} END AS smd
    FROM agg
"""


@gate("smd_balance", _SB_SQL)
def q_smd_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_SB_ARM).alias("g"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_stats.smd_balance(ev, arm="g", covariate="v")
