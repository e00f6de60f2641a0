"""Gate registry extension 136 — rank-test batch: Kendall tau-b,
Kruskal-Wallis H, Brown-Forsythe equal-variance W."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# kendall_tau — tau-b with ties on a filtered events slice (O(n^2)
# pairwise, the oracle-exact small-n path; ~1.4k rows -> ~1M pairs)
# ---------------------------------------------------------------------------
_KT_FILTER = "event_id % 7 = 0"
_KT_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS i,
             CAST(floor(value) AS BIGINT) AS x,
             user_id % 50 AS y
      FROM events WHERE {_KT_FILTER}
    ),
    cls AS (
      SELECT CASE
               WHEN (a.x < b.x AND a.y < b.y)
                 OR (a.x > b.x AND a.y > b.y) THEN 0
               WHEN (a.x < b.x AND a.y > b.y)
                 OR (a.x > b.x AND a.y < b.y) THEN 1
               WHEN a.x = b.x AND a.y = b.y THEN 4
               WHEN a.x = b.x THEN 2 ELSE 3 END AS k
      FROM s a JOIN s b ON a.i < b.i
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nc,
             CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS nd,
             CAST(sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS tx,
             CAST(sum(CASE WHEN k = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS ty,
             CAST(sum(CASE WHEN k = 4 THEN 1 ELSE 0 END) AS BIGINT)
               AS txy
      FROM cls
    )
    SELECT nc, nd, tx, ty, txy,
           CASE WHEN nc + nd + ty > 0 AND nc + nd + tx > 0 THEN
             cast(nc - nd as double)
             / sqrt(cast(nc + nd + ty as double)
             * cast(nc + nd + tx as double)) END AS tau_b
    FROM agg
"""


@gate("kendall_tau", _KT_SQL)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_KT_FILTER).select(
        F.col("event_id").alias("i"),
        F.expr("cast(floor(value) as bigint)").alias("x"),
        (F.col("user_id") % 50).alias("y"),
    )
    return ops_stats.kendall_tau(ev, x="x", y="y", id_col="i")


# ---------------------------------------------------------------------------
# kruskal_wallis — 3-group rank ANOVA over the full events table
# (doubled mid-ranks; quantized per-group (2R)^2/n fold)
# ---------------------------------------------------------------------------
_KW_Q = ops_stats.KW_Q
_KW_H = (
    "(3.0e0 * (cast(s_q as double) / 65536.0e0)"
    " / (cast(n as double) * (cast(n as double) + 1.0e0))"
    " - 3.0e0 * (cast(n as double) + 1.0e0))"
)
_KW_CORR = (
    "(1.0e0 - cast(tie3 as double)"
    " / (cast(n as double) * cast(n as double) * cast(n as double)"
    " - cast(n as double)))"
)
_KW_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 3 AS g, value AS v FROM events
    ),
    per AS (
      SELECT g, v, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY 1, 2
    ),
    tot AS (
      SELECT v, CAST(sum(c) AS BIGINT) AS t
      FROM per GROUP BY 1
    ),
    ranked AS (
      SELECT v, t,
             CAST(sum(t) OVER (ORDER BY v ASC
               ROWS UNBOUNDED PRECEDING) - t AS BIGINT) AS cprev
      FROM tot
    ),
    grp AS (
      SELECT g, CAST(sum(c) AS BIGINT) AS n_g,
             CAST(sum(c * (2 * cprev + t + 1)) AS BIGINT) AS two_r_g
      FROM per JOIN ranked USING (v) GROUP BY g
    ),
    ties AS (
      SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie3,
             CAST(sum(t) AS BIGINT) AS n
      FROM tot
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum((two_r_g * two_r_g // n_g)
                 * CAST({_KW_Q} AS BIGINT)
               + ((two_r_g * two_r_g % n_g)
                 * CAST({_KW_Q} AS BIGINT)) // n_g) AS BIGINT)
               AS s_q
      FROM grp
    )
    SELECT n, k, tie3, s_q,
           CASE WHEN n > 1 THEN {_KW_H} END AS h,
           CASE WHEN n > 1 AND {_KW_CORR} > 0
             THEN {_KW_H} / {_KW_CORR} END AS h_c
    FROM agg, ties
"""


@gate("kruskal_wallis", _KW_SQL)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 3).alias("g"), F.col("value").alias("v")
    )
    return ops_stats.kruskal_wallis(ev, group="g", value="v")


# ---------------------------------------------------------------------------
# brown_forsythe — 4-group equal-variance W on a coarse-quantized
# events slice (bounds: N=2000, |2z| <= ~250 keeps every fold int64)
# ---------------------------------------------------------------------------
_BF_FILTER = "event_id % 5 = 0"
_BF_W = (
    "((cast(n as double) - cast(k as double))"
    " / (cast(k as double) - 1.0e0))"
    " * (cast(num_q as double)"
    " / (cast(n as double) * cast(n as double)))"
    " / cast(den_q as double)"
)
_BF_Q = ops_stats.BF_Q
_BF_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 4 AS g,
             CAST(floor(value / 4) AS BIGINT) AS xv
      FROM events WHERE {_BF_FILTER}
    ),
    rn AS (
      SELECT g, xv,
             row_number() OVER (PARTITION BY g ORDER BY xv ASC)
               AS rn,
             count(*) OVER (PARTITION BY g) AS nn
      FROM s
    ),
    med AS (
      SELECT g,
             CASE WHEN count(*) = 1 THEN 2 * sum(xv)
               ELSE sum(xv) END AS med2
      FROM rn
      WHERE rn = (nn + 1) // 2 OR rn = (nn + 2) // 2
      GROUP BY g
    ),
    z AS (
      SELECT s.g, abs(2 * s.xv - med.med2) AS z2
      FROM s JOIN med ON s.g = med.g
    ),
    grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(z2) AS BIGINT) AS s_g,
             CAST(sum(z2 * z2) AS BIGINT) AS ss_g
      FROM z GROUP BY g
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(s_g) AS BIGINT) AS t_all
      FROM grp
    ),
    agg AS (
      SELECT n, k,
             CAST(sum(
               ((n * s_g - n_g * t_all) * (n * s_g - n_g * t_all)
                 // n_g) * CAST({_BF_Q} AS BIGINT)
               + (((n * s_g - n_g * t_all)
                   * (n * s_g - n_g * t_all) % n_g)
                 * CAST({_BF_Q} AS BIGINT)) // n_g) AS BIGINT)
               AS num_q,
             CAST(sum(
               ((n_g * ss_g - s_g * s_g) // n_g)
                 * CAST({_BF_Q} AS BIGINT)
               + (((n_g * ss_g - s_g * s_g) % n_g)
                 * CAST({_BF_Q} AS BIGINT)) // n_g) AS BIGINT)
               AS den_q
      FROM grp, tot GROUP BY n, k
    )
    SELECT n, k, num_q, den_q,
           CASE WHEN k > 1 AND den_q > 0 THEN {_BF_W} END AS w
    FROM agg
"""


@gate("brown_forsythe", _BF_SQL)
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_BF_FILTER).select(
        (F.col("user_id") % 4).alias("g"),
        F.expr("cast(floor(value / 4) as bigint)").alias("xv"),
    )
    return ops_stats.brown_forsythe(ev, group="g", value="xv")
