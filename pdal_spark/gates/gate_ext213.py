"""Gate registry extension 213 — richness-scaling batch: SAR
exponent and exact rarefaction."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import textops as ops_text

_SA_Q = float(ops_text.SAR_Q)
_SA_SP = f"(CAST({G.lehmer2('event_id')} % 120 AS BIGINT))"
_SA_LN2Q = G.fnum(math.log(2.0) * _SA_Q)


def _sa_level(lvl: int) -> str:
    return f"""
      SELECT CAST({lvl} AS BIGINT) AS lvl,
             CAST(floor(ln(cast(sum(s_b) as double)
               / cast(count(*) as double))
               * {_SA_Q!r}e0 + 0.5e0) AS BIGINT) AS y_q
      FROM (
        SELECT b, CAST(count(*) AS BIGINT) AS s_b FROM (
          SELECT DISTINCT p // {1 << lvl} AS b, sp FROM s0
        ) d GROUP BY b
      ) r
    """


_SA_SQL = f"""
    WITH s0 AS MATERIALIZED (
      SELECT CAST(user_id % 16 AS BIGINT) AS p, {_SA_SP} AS sp
      FROM events
    ),
    ladder AS (
      {" UNION ALL ".join(_sa_level(l) for l in range(3))}
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n_levels,
             CAST(sum(lvl) AS BIGINT) AS sx,
             CAST(sum(y_q) AS BIGINT) AS sy,
             CAST(sum(lvl * y_q) AS BIGINT) AS sxy,
             CAST(sum(lvl * lvl) AS BIGINT) AS sxx
      FROM ladder
    )
    SELECT n_levels,
           CAST(n_levels * sxy - sx * sy AS BIGINT) AS num,
           CAST(n_levels * sxx - sx * sx AS BIGINT) AS den,
           CASE WHEN n_levels * sxx - sx * sx <> 0 THEN
             cast(n_levels * sxy - sx * sy as double)
             / cast(n_levels * sxx - sx * sx as double)
             / {_SA_LN2Q} END AS z
    FROM mom
"""


@gate("sar_exponent", _SA_SQL)
def q_sar_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(user_id % 16 as bigint)").alias("p"),
        F.expr(
            f"cast({G.lehmer2('event_id')} % 120 as bigint)"
        ).alias("sp"),
    )
    return ops_text.sar_exponent(
        ev, part_fine="p", species="sp", levels=3
    )


_RA_M = 10
_RA_Q = float(ops_text.RAR_Q)
_RA_PROD = " * ".join(
    f"(cast(greatest(n - c - {i}, 0) as double)"
    f" / cast(n - {i} as double))"
    for i in range(_RA_M)
)
_RA_SQL = f"""
    WITH cnt AS MATERIALIZED (
      SELECT {_SA_SP} AS sp, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS s_obs
      FROM cnt
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST(max(s_obs) AS BIGINT) AS s_obs,
           CAST(sum(cast(floor((1.0e0 - ({_RA_PROD}))
             * {_RA_Q!r}e0 + 0.5e0) as bigint)) AS BIGINT) AS e_q,
           cast(sum(cast(floor((1.0e0 - ({_RA_PROD}))
             * {_RA_Q!r}e0 + 0.5e0) as bigint)) as double)
             / {_RA_Q!r}e0 AS e_sm
    FROM cnt, tot
"""


@gate("rarefaction", _RA_SQL)
def q_rarefaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(
            f"cast({G.lehmer2('event_id')} % 120 as bigint)"
        ).alias("sp")
    )
    return ops_text.rarefaction_expected(ev, species="sp",
                                         m=_RA_M)
