"""Gate registry extension 228 — queueing batch 2: Erlang-B and
M/G/1 wait."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_EB_PRED = "event_id % 29 = 0"
_EB_ARR = "(1 + event_id % 40)"
_EB_MU = "(10 + user_id % 10)"
_EB_C = f"(1 + CAST({G.lehmer2('event_id')} % 8 AS BIGINT))"
_EB_A = f"(cast({_EB_ARR} as double) / cast({_EB_MU} as double))"


def _eb_pb() -> str:
    branches = []
    for cc in range(1, 13):
        inv = "1.0e0"
        for k in range(1, cc + 1):
            inv = (
                f"(1.0e0 + ({G.fnum(float(k))} / {_EB_A})"
                f" * {inv})"
            )
        branches.append(
            f"WHEN CAST({_EB_C} AS INT) = {cc}"
            f" THEN (1.0e0 / {inv})"
        )
    return "CASE " + " ".join(branches) + " END"


_EB_SQL = f"""
    SELECT event_id,
           round({_EB_A}, 9) AS load_r,
           round({_eb_pb()}, 9) AS p_block_r
    FROM events WHERE {_EB_PRED}
"""


@gate("erlang_b", _EB_SQL)
def q_erlang_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_EB_PRED).select(
        "event_id",
        F.expr(_EB_ARR).cast("long").alias("lam"),
        F.expr(_EB_MU).cast("long").alias("mu"),
        F.expr(
            f"1 + cast({G.lehmer2('event_id')} % 8 as bigint)"
        ).alias("c"),
    )
    return ops_stats.erlang_b(
        ev, arrivals="lam", service_rate="mu", servers="c"
    ).select("event_id", "load_r", "p_block_r")


_MG_LN, _MG_LD = 1, 300
_MG_LAM = f"({float(_MG_LN)!r}e0 / {float(_MG_LD)!r}e0)"
_MG_ES = "(cast(s_sum as double) / cast(n as double))"
_MG_ES2 = "(cast(ss_sum as double) / cast(n as double))"
_MG_RHO = f"({_MG_LAM} * {_MG_ES})"
_MG_WQ = f"({_MG_LAM} * {_MG_ES2} / (2.0e0 * (1.0e0 - {_MG_RHO})))"
_MG_SQL = f"""
    WITH s0 AS MATERIALIZED (
      SELECT user_id % 8 AS k,
             CAST(floor(value / 4) AS BIGINT) AS s
      FROM events
    ),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(s) AS BIGINT) AS s_sum,
             CAST(sum(s * s) AS BIGINT) AS ss_sum
      FROM s0 GROUP BY k
    )
    SELECT k, n, s_sum, ss_sum,
           CASE WHEN n > 0 THEN {_MG_RHO} END AS rho,
           CASE WHEN n > 0 AND {_MG_RHO} < 1.0e0 THEN {_MG_WQ}
             END AS wq
    FROM agg
"""


@gate("mg1_wait", _MG_SQL)
def q_mg1_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 8).alias("k"),
        F.expr("cast(floor(value / 4) as bigint)").alias("s"),
    )
    return ops_stats.mg1_wait(
        ev, key="k", service="s",
        arrival_rate_num=_MG_LN, arrival_rate_den=_MG_LD,
    )
