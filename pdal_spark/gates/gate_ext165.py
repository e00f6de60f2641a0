"""Gate registry extension 165 — agreement/turnover batch:
Kendall's W, Lin's CCC, Whittaker beta diversity."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext139 import _FR_CELLS, _friedman_cells
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import textops as ops_text

# ---------------------------------------------------------------------------
# kendalls_w — the friedman complete-block fixture (raters = blocks)
# ---------------------------------------------------------------------------
_KW_SQL = f"""
    WITH {_FR_CELLS},
    rj AS (
      SELECT j, CAST(sum(two_r) AS BIGINT) AS two_rj
      FROM tr GROUP BY j
    ),
    ties AS (
      SELECT CAST(sum(t * t * t - t) AS BIGINT) AS sum_ties
      FROM per
    ),
    s4 AS (
      SELECT CAST(sum((two_rj - n * (k + 1))
               * (two_rj - n * (k + 1))) AS BIGINT) AS s4
      FROM rj, nb, kk
    )
    SELECT n AS m, k AS n,
           CAST(12 * s4 AS BIGINT) AS num4,
           CAST(4 * (n * n * (k * k * k - k) - n * sum_ties)
             AS BIGINT) AS den4,
           CASE WHEN n * n * (k * k * k - k) - n * sum_ties > 0
             THEN cast(12 * s4 as double)
             / cast(4 * (n * n * (k * k * k - k) - n * sum_ties)
               as double) END AS w
    FROM s4, nb, kk, ties
"""


@gate("kendalls_w", _KW_SQL)
def q_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_stats.kendalls_w(
        _friedman_cells(spark, sf_dir),
        rater="i", item="j", value="v",
    )


# ---------------------------------------------------------------------------
# lins_ccc — reference score vs shifted/rescaled re-score
# ---------------------------------------------------------------------------
_LC_X = "CAST(floor(value) AS BIGINT)"
_LC_Y = (
    f"(CAST(floor(value) AS BIGINT) * 9 // 10"
    f" + CAST({G.lehmer2('event_id')} % 7 AS BIGINT))"
)
_LC_Y_SP = (
    f"(cast(floor(value) as bigint) * 9 div 10"
    f" + cast({G.lehmer2('event_id')} % 7 as bigint))"
)
_LCC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_LC_X} AS xv, {_LC_Y} AS yv FROM events
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xv) AS BIGINT) AS sx,
             CAST(sum(yv) AS BIGINT) AS sy,
             CAST(sum(xv * yv) AS BIGINT) AS sxy,
             CAST(sum(xv * xv) AS BIGINT) AS sxx,
             CAST(sum(yv * yv) AS BIGINT) AS syy
      FROM s
    ),
    scaled AS (
      SELECT n,
             CAST(n * sxy - sx * sy AS BIGINT) AS cxy_n,
             CAST(n * sxx - sx * sx AS BIGINT) AS vx_n,
             CAST(n * syy - sy * sy AS BIGINT) AS vy_n,
             CAST((sx - sy) * (sx - sy) AS BIGINT) AS shift2
      FROM mom
    )
    SELECT n, cxy_n, vx_n, vy_n, shift2,
           CASE WHEN vx_n + vy_n + shift2 > 0 THEN
             2.0e0 * cast(cxy_n as double)
             / (cast(vx_n as double) + cast(vy_n as double)
             + cast(shift2 as double)) END AS ccc
    FROM scaled
"""


@gate("lins_ccc", _LCC_SQL)
def q_lins_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(floor(value) as bigint)").alias("xv"),
        F.expr(_LC_Y_SP).alias("yv"),
    )
    return ops_stats.lins_ccc(ev, x="xv", y="yv")


# ---------------------------------------------------------------------------
# beta_diversity — species turnover across user-bucket parts
# ---------------------------------------------------------------------------
_BD_SP = f"(CAST({G.lehmer2('event_id')} % 200 AS BIGINT))"
_BD_SQL = f"""
    WITH base AS MATERIALIZED (
      SELECT DISTINCT user_id % 10 AS p, {_BD_SP} AS s
      FROM events
    ),
    alpha AS (
      SELECT p, CAST(count(*) AS BIGINT) AS s_p
      FROM base GROUP BY p
    ),
    a_tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(s_p) AS BIGINT) AS sum_alpha
      FROM alpha
    ),
    gam AS (
      SELECT CAST(count(DISTINCT s) AS BIGINT) AS s_gamma
      FROM base
    )
    SELECT n_parts, s_gamma, sum_alpha,
           CASE WHEN sum_alpha > 0 THEN
             cast(s_gamma * n_parts as double)
             / cast(sum_alpha as double) END AS beta_w
    FROM a_tot, gam
"""


@gate("beta_diversity", _BD_SQL)
def q_beta_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("p"),
        F.expr(
            f"cast({G.lehmer2('event_id')} % 200 as bigint)"
        ).alias("s"),
    )
    return ops_text.beta_diversity(ev, part="p", species="s")
