"""Gate registry extension 153 — decision batch: Youden optimal
cutoff, James-Stein mean shrinkage, 2-D Mahalanobis distances."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext144 import _EV_LABEL, _EV_LABEL_SP, _EV_SCORE
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# youden_cutoff — same score/label fixture as auc_exact
# ---------------------------------------------------------------------------
_YC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_EV_SCORE} AS v, {_EV_LABEL} AS y FROM events
    ),
    per AS (
      SELECT v, CAST(sum(y) AS BIGINT) AS cp,
             CAST(sum(1 - y) AS BIGINT) AS cn
      FROM s GROUP BY v
    ),
    c AS (
      SELECT v,
             CAST(sum(cp) OVER (ORDER BY v DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
             CAST(sum(cn) OVER (ORDER BY v DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp,
             CAST(sum(cp) OVER () AS BIGINT) AS n_pos,
             CAST(sum(cn) OVER () AS BIGINT) AS n_neg
      FROM per
    ),
    jn AS (
      SELECT *, CAST(tp * n_neg - fp * n_pos AS BIGINT) AS j_num
      FROM c
    ),
    mx AS (SELECT CAST(max(j_num) AS BIGINT) AS mj FROM jn),
    best AS (
      SELECT n_pos, n_neg, mj, CAST(min(v) AS BIGINT) AS t_star
      FROM jn, mx WHERE jn.j_num = mx.mj
      GROUP BY n_pos, n_neg, mj
    )
    SELECT best.n_pos, best.n_neg, t_star, jn.tp, jn.fp,
           CASE WHEN best.n_pos > 0 AND best.n_neg > 0 THEN
             cast(mj as double) / (cast(best.n_pos as double)
             * cast(best.n_neg as double)) END AS j
    FROM best JOIN jn ON jn.v = best.t_star
"""


@gate("youden_cutoff", _YC_SQL)
def q_youden_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_EV_SCORE).alias("v"),
        F.expr(_EV_LABEL_SP).alias("y"),
    )
    return ops_stats.youden_cutoff(ev, score="v", label="y")


# ---------------------------------------------------------------------------
# james_stein_means — 12 user buckets of floored values
# ---------------------------------------------------------------------------
_JS_Q = float(ops_stats.JS_Q)
_JS_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 12 AS g, CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(v) AS BIGINT) AS s_g,
             CAST(sum(v * v) AS BIGINT) AS ss_g
      FROM s GROUP BY g
    ),
    grp2 AS (
      SELECT *,
             CAST(floor(cast(s_g as double) / cast(n_g as double)
               * {_JS_Q!r}e0 + 0.5e0) AS BIGINT) AS m_q
      FROM grp
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(m_q) AS BIGINT) AS sm_q,
             CAST(sum(m_q * m_q) AS BIGINT) AS smm_q,
             CAST(sum(n_g) AS BIGINT) AS n_all,
             CAST(sum(cast(floor((cast(n_g as double)
               * cast(ss_g as double)
               - cast(s_g as double) * cast(s_g as double))
               / (cast(n_g as double) * cast(n_g as double)
               * (cast(n_g as double) - 1.0e0))
               * {_JS_Q!r}e0 + 0.5e0) as bigint)) AS BIGINT)
               AS sv_q
      FROM grp2
    )
    SELECT g, n_g, m_q,
           CASE WHEN k > 3
             AND (cast(k as double) * cast(smm_q as double)
             - cast(sm_q as double) * cast(sm_q as double))
             > 0.0e0 THEN
             round(((cast(sm_q as double) / cast(k as double))
             + greatest(0.0e0, 1.0e0
               - (cast(k as double) - 3.0e0)
               * (cast(sv_q as double) / cast(k as double))
               * cast(k as double) * {_JS_Q!r}e0
               / (cast(k as double) * cast(smm_q as double)
               - cast(sm_q as double) * cast(sm_q as double)))
             * (cast(m_q as double)
               - (cast(sm_q as double) / cast(k as double))))
             / {_JS_Q!r}e0, 9) END AS shrunk_r
    FROM grp2, tot
"""


@gate("james_stein", _JS_SQL)
def q_james_stein(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 12).alias("g"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_stats.james_stein_means(ev, group="g", value="v")


# ---------------------------------------------------------------------------
# mahalanobis_2d — geocoded point cloud, whole-cloud moments
# ---------------------------------------------------------------------------
_MH_PRED = "event_id % 13 = 0"
_MH_PX = f"(CAST(floor({G.geo_lon('event_id')}) AS BIGINT))"
_MH_PY = f"(CAST(floor({G.geo_lat('event_id')}) AS BIGINT))"
_MH_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS i, {_MH_PX} AS px, {_MH_PY} AS py
      FROM events WHERE {_MH_PRED}
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(px) AS BIGINT) AS sx,
             CAST(sum(py) AS BIGINT) AS sy,
             CAST(count(*) * sum(px * px)
               - sum(px) * sum(px) AS BIGINT) AS a,
             CAST(count(*) * sum(px * py)
               - sum(px) * sum(py) AS BIGINT) AS b,
             CAST(count(*) * sum(py * py)
               - sum(py) * sum(py) AS BIGINT) AS c
      FROM s
    )
    SELECT i,
           CASE WHEN (cast(a as double) * cast(c as double)
             - cast(b as double) * cast(b as double)) > 0.0e0 THEN
             round((cast(c as double)
               * (cast(n as double) * cast(px as double)
                  - cast(sx as double))
               * (cast(n as double) * cast(px as double)
                  - cast(sx as double))
               - 2.0e0 * cast(b as double)
               * (cast(n as double) * cast(px as double)
                  - cast(sx as double))
               * (cast(n as double) * cast(py as double)
                  - cast(sy as double))
               + cast(a as double)
               * (cast(n as double) * cast(py as double)
                  - cast(sy as double))
               * (cast(n as double) * cast(py as double)
                  - cast(sy as double)))
             / (cast(a as double) * cast(c as double)
               - cast(b as double) * cast(b as double)), 9) END
             AS md2_r
    FROM s, mom
"""


@gate("mahalanobis_2d", _MH_SQL)
def q_mahalanobis_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_MH_PRED).select(
        F.col("event_id").alias("i"),
        F.expr(f"cast(floor({G.geo_lon('event_id')}) as bigint)")
        .alias("px"),
        F.expr(f"cast(floor({G.geo_lat('event_id')}) as bigint)")
        .alias("py"),
    )
    return ops_stats.mahalanobis_2d(ev, x="px", y="py", id_col="i")
