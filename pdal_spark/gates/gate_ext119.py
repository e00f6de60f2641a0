"""Gate registry extension 119 — categorical-inference batch:
G-test of independence, 2x2 odds ratio, McNemar's paired test."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_GT_QF = G.fnum(float(ops_stats.ENTROPY_Q))

# ---------------------------------------------------------------------------
# g_test — the chi_square fixture, likelihood-ratio form
# ---------------------------------------------------------------------------
_GT_SQL = f"""
    WITH obs AS MATERIALIZED (
      SELECT user_id % 6 AS a, event_type AS b,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r_i
           FROM obs GROUP BY a),
    cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c_j
           FROM obs GROUP BY b),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
    agg AS (
      SELECT max(n) AS n,
             CAST(sum(cast(floor(cast(o as double)
               * ln(cast(n as double) * cast(o as double)
                    / (cast(r_i as double) * cast(c_j as double)))
               * {_GT_QF} + {G.fnum(0.5)}) as bigint)) AS BIGINT)
               AS g_q
      FROM obs JOIN ra USING (a) JOIN cb USING (b), tot
    )
    SELECT n, g_q,
           round(2.0e0 * cast(g_q as double) / {_GT_QF}, 9)
             AS g_stat
    FROM agg
"""


@gate("g_test", _GT_SQL)
def q_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 6).alias("a"),
        F.col("event_type").alias("b"),
    )
    return ops_stats.g_test(ev, a="a", b="b")


# ---------------------------------------------------------------------------
# odds_ratio — hash exposure vs correlated hash outcome
# ---------------------------------------------------------------------------
_OR_EXP = f"(CASE WHEN {G.lehmer2('event_id')} % 3 = 0 THEN 1 ELSE 0 END)"
_OR_CASE = (
    f"(CASE WHEN {G.lehmer2('event_id * 7 + 1')} % 10"
    f" < 2 + 3 * ({_OR_EXP}) THEN 1 ELSE 0 END)"
)
_OR_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_OR_EXP} AS e, {_OR_CASE} AS y FROM events
    ),
    cells AS (
      SELECT CAST(sum(e * y) AS BIGINT) AS a,
             CAST(sum(e * (1 - y)) AS BIGINT) AS b,
             CAST(sum((1 - e) * y) AS BIGINT) AS c,
             CAST(sum((1 - e) * (1 - y)) AS BIGINT) AS d
      FROM s
    )
    SELECT a, b, c, d,
           case when a > 0 and b > 0 and c > 0 and d > 0 then
             (cast(a as double) * cast(d as double))
             / (cast(b as double) * cast(c as double)) end AS or_est,
           case when a > 0 and b > 0 and c > 0 and d > 0 then
             sqrt(1.0e0 / cast(a as double)
                  + 1.0e0 / cast(b as double)
                  + 1.0e0 / cast(c as double)
                  + 1.0e0 / cast(d as double)) end AS log_se
    FROM cells
"""


@gate("odds_ratio", _OR_SQL)
def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_OR_EXP).alias("exposed"),
        F.expr(_OR_CASE).alias("is_case"),
    )
    return ops_stats.odds_ratio(ev)


# ---------------------------------------------------------------------------
# mcnemar — paired decisions of two hash classifiers
# ---------------------------------------------------------------------------
_MC_X = f"(CASE WHEN {G.lehmer2('event_id')} % 5 < 2 THEN 1 ELSE 0 END)"
_MC_Y = (
    f"(CASE WHEN ({G.lehmer2('event_id')} % 5"
    f" + {G.lehmer2('event_id * 11 + 4')} % 3) < 3 THEN 1 ELSE 0"
    " END)"
)
_MC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_MC_X} AS x, {_MC_Y} AS y FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x * (1 - y)) AS BIGINT) AS b,
           CAST(sum((1 - x) * y) AS BIGINT) AS c,
           case when sum(x * (1 - y)) + sum((1 - x) * y) > 0 then
             cast((sum(x * (1 - y)) - sum((1 - x) * y))
                  * (sum(x * (1 - y)) - sum((1 - x) * y)) as double)
             / cast(sum(x * (1 - y)) + sum((1 - x) * y) as double)
             end AS mcnemar_chi2
    FROM s
"""


@gate("mcnemar", _MC_SQL)
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_MC_X).alias("x"),
        F.expr(_MC_Y).alias("y"),
    )
    return ops_stats.mcnemar_test(ev)
