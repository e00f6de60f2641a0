"""Gate registry extension 137 — series-diagnostics batch:
Durbin-Watson, Ljung-Box Q (h=3), PACF lags 1-2."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

# shared fixture: per-user-bucket series ordered by event_id,
# integer-quantized values (the acf gate's deviation-grid family)
_TS_BASE = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 4 AS k, event_id AS o,
             CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    mom AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS sx
      FROM s GROUP BY k
    ),
    dev AS (
      SELECT s.k, s.o, mom.n, mom.n * s.v - mom.sx AS d
      FROM s JOIN mom ON s.k = mom.k
    )
"""

_DW_SQL = f"""
    {_TS_BASE},
    lagd AS (
      SELECT k, n, d,
             lag(d, 1) OVER (PARTITION BY k ORDER BY o) AS p
      FROM dev
    ),
    agg AS (
      SELECT k, CAST(max(n) AS BIGINT) AS n,
             CAST(sum(d * d) AS BIGINT) AS den,
             CAST(sum(CASE WHEN p IS NOT NULL
               THEN (d - p) * (d - p) END) AS BIGINT) AS num
      FROM lagd GROUP BY k
    )
    SELECT k, n, num, den,
           CASE WHEN den > 0 THEN
             cast(num as double) / cast(den as double) END AS dw
    FROM agg
"""


@gate("durbin_watson", _DW_SQL)
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("k"),
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.durbin_watson(ev, key="k", order="o",
                                      value="v")


def _lb_q() -> str:
    nf = "cast(n as double)"
    terms = " + ".join(
        f"(cast(c{j} as double) / cast(c0 as double))"
        f" * (cast(c{j} as double) / cast(c0 as double))"
        f" / ({nf} - {float(j)!r}e0)"
        for j in (1, 2, 3)
    )
    return f"({nf} * ({nf} + 2.0e0) * ({terms}))"


_LB_SQL = f"""
    {_TS_BASE},
    lags AS (
      SELECT k, n, d,
             lag(d, 1) OVER (PARTITION BY k ORDER BY o) AS p1,
             lag(d, 2) OVER (PARTITION BY k ORDER BY o) AS p2,
             lag(d, 3) OVER (PARTITION BY k ORDER BY o) AS p3
      FROM dev
    ),
    agg AS (
      SELECT k, CAST(max(n) AS BIGINT) AS n,
             CAST(sum(d * d) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN p1 IS NOT NULL THEN d * p1 END)
               AS BIGINT) AS c1,
             CAST(sum(CASE WHEN p2 IS NOT NULL THEN d * p2 END)
               AS BIGINT) AS c2,
             CAST(sum(CASE WHEN p3 IS NOT NULL THEN d * p3 END)
               AS BIGINT) AS c3
      FROM lags GROUP BY k
    )
    SELECT k, n, c0, c1, c2, c3,
           CASE WHEN n > 3 AND c0 > 0 THEN {_lb_q()} END AS q_lb
    FROM agg
"""


@gate("ljung_box", _LB_SQL)
def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("k"),
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.ljung_box(ev, key="k", order="o", value="v")


_P_R1 = "(cast(c1 as double) / cast(c0 as double))"
_P_R2 = "(cast(c2 as double) / cast(c0 as double))"
_PACF_SQL = f"""
    {_TS_BASE},
    lags AS (
      SELECT k, n, d,
             lag(d, 1) OVER (PARTITION BY k ORDER BY o) AS p1,
             lag(d, 2) OVER (PARTITION BY k ORDER BY o) AS p2
      FROM dev
    ),
    agg AS (
      SELECT k, CAST(max(n) AS BIGINT) AS n,
             CAST(sum(d * d) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN p1 IS NOT NULL THEN d * p1 END)
               AS BIGINT) AS c1,
             CAST(sum(CASE WHEN p2 IS NOT NULL THEN d * p2 END)
               AS BIGINT) AS c2
      FROM lags GROUP BY k
    )
    SELECT k, n, c0, c1, c2,
           CASE WHEN c0 > 0 THEN {_P_R1} END AS phi11,
           CASE WHEN c0 > 0 AND 1.0e0 - {_P_R1} * {_P_R1} <> 0.0e0
             THEN ({_P_R2} - {_P_R1} * {_P_R1})
             / (1.0e0 - {_P_R1} * {_P_R1}) END AS phi22
    FROM agg
"""


@gate("pacf_lag2", _PACF_SQL)
def q_pacf_lag2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("k"),
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.pacf2(ev, key="k", order="o", value="v")
