"""Gate registry extension 208 — dependence batch: Chatterjee's xi
and the quadrant count ratio."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# planted NON-monotone dependence: y = (x - 50)^2 + jitter
_CX_PRED = "event_id % 13 = 0"
_CX_X = "(event_id % 101)"
_CX_Y = (
    f"((event_id % 101 - 50) * (event_id % 101 - 50)"
    f" + CAST({G.lehmer2('event_id')} % 5 AS BIGINT))"
)
_CX_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS i, CAST({_CX_X} AS BIGINT) AS xv,
             CAST({_CX_Y} AS BIGINT) AS yv
      FROM events WHERE {_CX_PRED}
    ),
    ycnt AS (
      SELECT yv, CAST(count(*) AS BIGINT) AS t
      FROM s GROUP BY yv
    ),
    yr AS (
      SELECT yv, CAST(sum(t) OVER (ORDER BY yv ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS r
      FROM ycnt
    ),
    seq AS (
      SELECT s.i, s.xv, yr.r FROM s JOIN yr ON s.yv = yr.yv
    ),
    lagged AS (
      SELECT r, lag(r, 1) OVER (ORDER BY xv ASC, i ASC) AS pr
      FROM seq
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN pr IS NOT NULL
             THEN abs(r - pr) END) AS BIGINT) AS s_abs,
           CASE WHEN count(*) > 1 THEN 1.0e0
             - 3.0e0 * cast(sum(CASE WHEN pr IS NOT NULL
               THEN abs(r - pr) END) as double)
             / (cast(count(*) as double)
               * cast(count(*) as double) - 1.0e0) END AS xi
    FROM lagged
"""


@gate("chatterjee_xi", _CX_SQL)
def q_chatterjee_xi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_CX_PRED).select(
        F.col("event_id").alias("i"),
        F.expr(f"cast({_CX_X} as bigint)").alias("xv"),
        F.expr(
            f"cast((event_id % 101 - 50) * (event_id % 101 - 50)"
            f" + cast({G.lehmer2('event_id')} % 5 as bigint)"
            " as bigint)"
        ).alias("yv"),
    )
    return ops_stats.chatterjee_xi(ev, x="xv", y="yv", id_col="i")


_QA_X = "CAST(floor(value) AS BIGINT)"
_QA_Y = (
    f"(CAST(floor(value) AS BIGINT)"
    f" + CAST({G.lehmer2('event_id')} % 60 AS BIGINT))"
)


def _qa_med2(col: str) -> str:
    return f"""
      SELECT CASE WHEN count(*) = 1 THEN 2 * sum({col})
               ELSE sum({col}) END AS med2_{col}
      FROM (
        SELECT {col},
               row_number() OVER (ORDER BY {col} ASC) AS rn,
               count(*) OVER () AS nn
        FROM s
      ) r WHERE rn = (nn + 1) // 2 OR rn = (nn + 2) // 2
    """


_QA_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_QA_X} AS xv, {_QA_Y} AS yv FROM events
    ),
    mx AS ({_qa_med2('xv')}),
    my AS ({_qa_med2('yv')}),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN (2 * xv - med2_xv)
               * (2 * yv - med2_yv) > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_conc,
             CAST(sum(CASE WHEN (2 * xv - med2_xv)
               * (2 * yv - med2_yv) < 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_disc
      FROM s, mx, my
    )
    SELECT n, n_conc, n_disc,
           CAST(n - n_conc - n_disc AS BIGINT) AS n_axis,
           CASE WHEN n > 0 THEN cast(n_conc - n_disc as double)
             / cast(n as double) END AS qcr
    FROM agg
"""


@gate("quadrant_assoc", _QA_SQL)
def q_quadrant_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(floor(value) as bigint)").alias("xv"),
        F.expr(
            f"cast(floor(value) as bigint)"
            f" + cast({G.lehmer2('event_id')} % 60 as bigint)"
        ).alias("yv"),
    )
    return ops_stats.quadrant_assoc(ev, x="xv", y="yv")
