"""Gate registry extension 139 — ordered-design batch: IV-Wald
estimator, Friedman rank test, Page's L trend."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# iv_wald — instrument z = deterministic hash bit; treatment x
# correlates with z plus endogenous noise; outcome y = f(x) + noise
# ---------------------------------------------------------------------------
_IV_Z = f"(CASE WHEN {G.lehmer2('event_id')} % 2 = 0 THEN 1 ELSE 0 END)"
_IV_X = (
    f"({_IV_Z} * 3 + (event_id % 7)"
    f" + CAST({G.lehmer2('event_id * 5 + 2')} % 4 AS BIGINT))"
)
_IV_Y = (
    f"(2 * {_IV_X} + (event_id % 7) * 5"
    f" + CAST({G.lehmer2('event_id * 11 + 3')} % 9 AS BIGINT))"
)
_IV_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_IV_Z} AS zv, {_IV_X} AS xv, {_IV_Y} AS yv
      FROM events
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(zv) AS BIGINT) AS sz,
             CAST(sum(xv) AS BIGINT) AS sx,
             CAST(sum(yv) AS BIGINT) AS sy,
             CAST(sum(zv * yv) AS BIGINT) AS szy,
             CAST(sum(zv * xv) AS BIGINT) AS szx,
             CAST(sum(zv * zv) AS BIGINT) AS szz
      FROM s
    ),
    scaled AS (
      SELECT n,
             CAST(n * szy - sz * sy AS BIGINT) AS czy_n,
             CAST(n * szx - sz * sx AS BIGINT) AS czx_n,
             CAST(n * szz - sz * sz AS BIGINT) AS czz_n
      FROM mom
    )
    SELECT n, czy_n, czx_n, czz_n,
           CASE WHEN czx_n <> 0 THEN
             cast(czy_n as double) / cast(czx_n as double) END
             AS beta_iv,
           CASE WHEN czz_n > 0 THEN
             cast(czx_n as double) / cast(czz_n as double) END
             AS pi
    FROM scaled
"""


@gate("iv_wald", _IV_SQL)
def q_iv_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_IV_Z).alias("zv"),
        F.expr(_IV_X).alias("xv"),
        F.expr(_IV_Y).alias("yv"),
    )
    return ops_stats.iv_wald(ev, z="zv", x="xv", y="yv")


# ---------------------------------------------------------------------------
# friedman_test / page_trend — 150 blocks x 4 ordered treatments,
# per-cell value aggregated; only COMPLETE blocks kept (both sides)
# ---------------------------------------------------------------------------
_FR_CELLS = """
    cells0 AS MATERIALIZED (
      SELECT user_id % 150 AS i, event_id % 4 + 1 AS j,
             CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    full_blocks AS MATERIALIZED (
      SELECT i FROM cells0 GROUP BY i HAVING count(*) = 4
    ),
    cells AS MATERIALIZED (
      SELECT cells0.* FROM cells0 JOIN full_blocks USING (i)
    ),
    per AS (
      SELECT i, v, CAST(count(*) AS BIGINT) AS t
      FROM cells GROUP BY i, v
    ),
    ranked AS (
      SELECT i, v, t,
             CAST(sum(t) OVER (PARTITION BY i ORDER BY v ASC
               ROWS UNBOUNDED PRECEDING) - t AS BIGINT) AS cprev
      FROM per
    ),
    tr AS MATERIALIZED (
      SELECT cells.i, cells.j,
             CAST(2 * ranked.cprev + ranked.t + 1 AS BIGINT)
               AS two_r
      FROM cells JOIN ranked
        ON cells.i = ranked.i AND cells.v = ranked.v
    ),
    nb AS (SELECT CAST(count(DISTINCT i) AS BIGINT) AS n FROM tr),
    kk AS (SELECT CAST(count(DISTINCT j) AS BIGINT) AS k FROM tr)
"""

_FR_SQL = f"""
    WITH {_FR_CELLS},
    rj AS (
      SELECT j, CAST(sum(two_r) AS BIGINT) AS two_rj
      FROM tr GROUP BY j
    ),
    a4 AS (
      SELECT CAST(sum(two_r * two_r) AS BIGINT) AS a4 FROM tr
    ),
    num AS (
      SELECT CAST(sum((two_rj - n * (k + 1))
               * (two_rj - n * (k + 1))) AS BIGINT) AS snum
      FROM rj, nb, kk
    )
    SELECT n, k, snum, a4,
           CASE WHEN a4 - n * k * (k + 1) * (k + 1) > 0 THEN
             (cast(k as double) - 1.0e0) * cast(snum as double)
             / (cast(a4 as double)
             - cast(n as double) * cast(k as double)
             * (cast(k as double) + 1.0e0)
             * (cast(k as double) + 1.0e0)) END AS chi2
    FROM num, nb, kk, a4
"""


def _friedman_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells0 = ev.groupBy(
        (F.col("user_id") % 150).alias("i"),
        (F.col("event_id") % 4 + 1).alias("j"),
    ).agg(
        F.sum(F.expr("cast(floor(value) as bigint)")).alias("v")
    )
    full = (
        cells0.groupBy("i").agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") == 4).select("i")
    )
    return cells0.join(full, on="i")


@gate("friedman_test", _FR_SQL)
def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_stats.friedman_test(
        _friedman_cells(spark, sf_dir),
        block="i", treatment="j", value="v",
    )


_PT_SQL = f"""
    WITH {_FR_CELLS},
    tl AS (
      SELECT CAST(sum(j * two_r) AS BIGINT) AS two_l FROM tr
    )
    SELECT n, k, two_l,
           cast(two_l as double) / 2.0e0 AS l
    FROM tl, nb, kk
"""


@gate("page_trend", _PT_SQL)
def q_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_stats.page_trend(
        _friedman_cells(spark, sf_dir),
        block="i", treatment="j", value="v",
    )
