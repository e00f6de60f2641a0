"""Gate registry extension 169 — monitoring batch: g-chart rare-
event control and Jarque-Bera normality."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# g_chart — rare hashed events along the event_id stream
# ---------------------------------------------------------------------------
_GC_EV = f"(CASE WHEN {G.lehmer2('event_id')} % 37 = 0 THEN 1 ELSE 0 END)"
_GC_GBAR = "(cast(sum_gap as double) / cast(n_events as double))"
_GC_UCL = (
    f"({_GC_GBAR} + 3.0e0 * sqrt({_GC_GBAR}"
    f" * ({_GC_GBAR} + 1.0e0)))"
)
_GC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, {_GC_EV} AS ev FROM events
    ),
    pos2 AS MATERIALIZED (
      SELECT o, CAST(rn0 AS BIGINT) AS rn
      FROM (SELECT o, ev,
              row_number() OVER (ORDER BY o ASC) AS rn0
            FROM s) t
      WHERE ev = 1
    ),
    gaps AS (
      SELECT o, CAST(rn - lag(rn, 1) OVER (ORDER BY rn ASC) - 1
               AS BIGINT) AS gap
      FROM pos2
      QUALIFY lag(rn, 1) OVER (ORDER BY rn ASC) IS NOT NULL
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(gap) AS BIGINT) AS sum_gap
      FROM gaps
    )
    SELECT o, gap, n_events, sum_gap,
           CASE WHEN n_events > 0 THEN {_GC_UCL} END AS ucl,
           CAST(CASE WHEN n_events > 0 AND
             cast(gap as double) > {_GC_UCL} THEN 1 ELSE 0 END
             AS INT) AS flag
    FROM gaps, mom
"""


@gate("g_chart", _GC_SQL)
def q_g_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr(_GC_EV).alias("ev"),
    )
    return ops_temporal.g_chart(ev, order="o", event="ev")


# ---------------------------------------------------------------------------
# jarque_bera — normality of the quartered value distribution
# ---------------------------------------------------------------------------
_JB_NF = "cast(n as double)"
_JB_M1 = f"(cast(s1 as double) / {_JB_NF})"
_JB_M2 = f"(cast(s2 as double) / {_JB_NF} - {_JB_M1} * {_JB_M1})"
_JB_M3 = (
    f"(cast(s3 as double) / {_JB_NF}"
    f" - 3.0e0 * {_JB_M1} * cast(s2 as double) / {_JB_NF}"
    f" + 2.0e0 * {_JB_M1} * {_JB_M1} * {_JB_M1})"
)
_JB_M4 = (
    f"(cast(s4 as double) / {_JB_NF}"
    f" - 4.0e0 * {_JB_M1} * cast(s3 as double) / {_JB_NF}"
    f" + 6.0e0 * {_JB_M1} * {_JB_M1} * cast(s2 as double)"
    f" / {_JB_NF}"
    f" - 3.0e0 * {_JB_M1} * {_JB_M1} * {_JB_M1} * {_JB_M1})"
)
_JB_SK = f"({_JB_M3} / sqrt({_JB_M2} * {_JB_M2} * {_JB_M2}))"
_JB_KU = f"({_JB_M4} / ({_JB_M2} * {_JB_M2}) - 3.0e0)"
_JB_JB = (
    f"({_JB_NF} / 6.0e0 * ({_JB_SK} * {_JB_SK}"
    f" + {_JB_KU} * {_JB_KU} / 4.0e0))"
)
_JB_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT CAST(floor(value / 4) AS BIGINT) AS v FROM events
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS s1,
             CAST(sum(v * v) AS BIGINT) AS s2,
             CAST(sum(v * v * v) AS BIGINT) AS s3,
             CAST(sum(v * v * v * v) AS BIGINT) AS s4
      FROM s
    )
    SELECT n, s1, s2, s3, s4,
           CASE WHEN n > 3 AND {_JB_M2} > 0.0e0 THEN {_JB_SK} END
             AS skew,
           CASE WHEN n > 3 AND {_JB_M2} > 0.0e0 THEN {_JB_KU} END
             AS kurt_ex,
           CASE WHEN n > 3 AND {_JB_M2} > 0.0e0 THEN {_JB_JB} END
             AS jb
    FROM mom
"""


@gate("jarque_bera", _JB_SQL)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(floor(value / 4) as bigint)").alias("v")
    )
    return ops_stats.jarque_bera(ev, value="v")
