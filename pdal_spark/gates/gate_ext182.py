"""Gate registry extension 182 — capacity batch: Erlang-C wait
probability and session concurrency sweep."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

_EC_PRED = "event_id % 29 = 0"
_EC_ARR = "(1 + event_id % 40)"
_EC_MU = "(10 + user_id % 10)"
_EC_C = f"(1 + CAST({G.lehmer2('event_id')} % 8 AS BIGINT))"
_EC_A = (
    f"(cast({_EC_ARR} as double) / cast({_EC_MU} as double))"
)


def _ec_pw() -> str:
    branches = []
    for cc in range(1, 13):
        s_terms = " + ".join(
            f"power({_EC_A}, {G.fnum(float(k))})"
            f" / {G.fnum(float(math.factorial(k)))}"
            for k in range(cc)
        )
        top = (
            f"(power({_EC_A}, {G.fnum(float(cc))})"
            f" / {G.fnum(float(math.factorial(cc)))})"
            f" * ({G.fnum(float(cc))} / ({G.fnum(float(cc))}"
            f" - {_EC_A}))"
        )
        branches.append(
            f"WHEN CAST({_EC_C} AS INT) = {cc}"
            f" THEN {top} / (({s_terms}) + {top})"
        )
    return (
        f"CASE WHEN {_EC_A} >= cast(CAST({_EC_C} AS INT)"
        " as double) THEN 1.0e0 "
        + " ".join(branches) + " END"
    )


_EC_SQL = f"""
    SELECT event_id,
           round({_EC_A}, 9) AS load_r,
           round({_ec_pw()}, 9) AS p_wait_r
    FROM events WHERE {_EC_PRED}
"""


@gate("erlang_c", _EC_SQL)
def q_erlang_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_EC_PRED).select(
        "event_id",
        F.expr(_EC_ARR).cast("long").alias("lam"),
        F.expr(_EC_MU).cast("long").alias("mu"),
        F.expr(
            f"1 + cast({G.lehmer2('event_id')} % 8 as bigint)"
        ).alias("c"),
    )
    return ops_stats.erlang_c(
        ev, arrivals="lam", service_rate="mu", servers="c"
    ).select("event_id", "load_r", "p_wait_r")


_CC_SQL = """
    WITH s AS MATERIALIZED (
      SELECT CAST(event_id % 500 AS BIGINT) AS st,
             CAST(event_id % 500 + 1
               + CAST(floor(value / 25) AS BIGINT) AS BIGINT)
               AS en
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT st AS s, en AS e FROM s WHERE en > st
    ),
    sweep AS (
      SELECT s AS t, CAST(1 AS BIGINT) AS d FROM base
      UNION ALL
      SELECT e, CAST(-1 AS BIGINT) FROM base
    ),
    run AS (
      SELECT CAST(sum(d) OVER (ORDER BY t ASC, d ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS live
      FROM sweep
    ),
    peak AS (SELECT CAST(max(live) AS BIGINT) AS peak FROM run),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(max(e) - min(s) AS BIGINT) AS span,
             CAST(sum(e - s) AS BIGINT) AS sum_dur
      FROM base
    )
    SELECT n, span, sum_dur, peak,
           CASE WHEN span > 0 THEN cast(sum_dur as double)
             / cast(span as double) END AS avg_live
    FROM mom, peak
"""


@gate("concurrency_stats", _CC_SQL)
def q_concurrency_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(event_id % 500 as bigint)").alias("st"),
        F.expr(
            "cast(event_id % 500 + 1"
            " + cast(floor(value / 25) as bigint) as bigint)"
        ).alias("en"),
    )
    return ops_temporal.concurrency_stats(ev, start="st", end="en")
