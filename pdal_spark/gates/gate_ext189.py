"""Gate registry extension 189 — feature/epi batch: information
gain with symmetric uncertainty and attributable fraction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_IG_Q = float(ops_stats.IG_Q)
_IG_X = "(event_id % 5)"
_IG_Y = (
    f"(CASE WHEN {G.lehmer2('event_id')} % 10"
    " < 2 + (event_id % 5) THEN 1 ELSE 0 END)"
)


def _ig_hsum(src: str, col: str) -> str:
    return f"""
      SELECT CAST(sum({col} * cast(floor(ln(cast(n_t.n as double)
               / cast({col} as double))
               * {_IG_Q!r}e0 + 0.5e0) as bigint)) AS BIGINT) AS hq
      FROM {src}, n_t
    """


_IG_NF = "cast(n as double)"
_IG_IG = (
    "((cast(hx_q as double) + cast(hy_q as double)"
    " - cast(hxy_q as double))"
    f" / ({_IG_NF} * {_IG_Q!r}e0))"
)
_IG_SU = (
    "(2.0e0 * (cast(hx_q as double) + cast(hy_q as double)"
    " - cast(hxy_q as double))"
    " / (cast(hx_q as double) + cast(hy_q as double)))"
)
_IG_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_IG_X} AS x, {_IG_Y} AS y FROM events
    ),
    nxy AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
            FROM s GROUP BY x, y),
    nx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx
           FROM nxy GROUP BY x),
    ny AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy
           FROM nxy GROUP BY y),
    n_t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM nxy),
    hx AS ({_ig_hsum('nx', 'cx')}),
    hy AS ({_ig_hsum('ny', 'cy')}),
    hxy AS ({_ig_hsum('nxy', 'c')})
    SELECT n, hx.hq AS hx_q, hy.hq AS hy_q, hxy.hq AS hxy_q,
           CASE WHEN n > 0 THEN
             ((cast(hx.hq as double) + cast(hy.hq as double)
             - cast(hxy.hq as double))
             / (cast(n as double) * {_IG_Q!r}e0)) END AS ig,
           CASE WHEN hx.hq + hy.hq > 0 THEN
             (2.0e0 * (cast(hx.hq as double)
             + cast(hy.hq as double) - cast(hxy.hq as double))
             / (cast(hx.hq as double) + cast(hy.hq as double)))
             END AS su
    FROM n_t, hx, hy, hxy
"""


@gate("info_gain", _IG_SQL)
def q_info_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_IG_X).alias("x"), F.expr(_IG_Y).alias("y")
    )
    return ops_stats.info_gain(ev, feature="x", label="y")


_AF_E = "(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END)"
_AF_Y = (
    f"(CASE WHEN {G.lehmer2('event_id')} % 10"
    " < 1 + 3 * (CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END)"
    " THEN 1 ELSE 0 END)"
)
_AF_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_AF_E} AS e, {_AF_Y} AS y FROM events
    ),
    agg AS (
      SELECT
        CAST(sum(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS a,
        CAST(sum(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS b,
        CAST(sum(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS c,
        CAST(sum(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS d
      FROM s
    )
    SELECT a, b, c, d,
           CASE WHEN c + d > 0 AND a + c > 0 THEN
             1.0e0 - (cast(c as double)
             * cast(a + b + c + d as double))
             / (cast(c + d as double) * cast(a + c as double))
             END AS paf
    FROM agg
"""


@gate("attributable_fraction", _AF_SQL)
def q_attributable_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_AF_E).alias("e"), F.expr(_AF_Y).alias("y")
    )
    return ops_stats.attributable_fraction(
        ev, exposed="e", case="y"
    )
