"""Gate registry extension 144 — model-eval batch: exact ROC AUC,
rational-probability log loss, cumulative gains/lift table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# shared fixture: score = hashed event feature, label correlated
# with the score so AUC is meaningfully > 0.5
_EV_SCORE = f"(CAST({G.lehmer2('event_id')} % 1000 AS BIGINT))"


def _ev_label(idiv: str) -> str:
    return (
        f"(CASE WHEN {G.lehmer2('event_id * 13 + 5')} % 1000"
        f" < 200 + {_EV_SCORE} {idiv} 2 THEN 1 ELSE 0 END)"
    )


_EV_LABEL = _ev_label("//")          # DuckDB dialect
_EV_LABEL_SP = _ev_label("div")      # Spark dialect

_AUC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_EV_SCORE} AS v, {_EV_LABEL} AS y FROM events
    ),
    per AS (
      SELECT v, CAST(sum(y) AS BIGINT) AS cp,
             CAST(sum(1 - y) AS BIGINT) AS cn,
             CAST(count(*) AS BIGINT) AS t
      FROM s GROUP BY v
    ),
    c AS (
      SELECT *,
             sum(t) OVER (ORDER BY v ASC
               ROWS UNBOUNDED PRECEDING) - t AS cprev
      FROM per
    ),
    agg AS (
      SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
             CAST(sum(cn) AS BIGINT) AS n_neg,
             CAST(sum(cp * (2 * cprev + t + 1)) AS BIGINT)
               AS two_r_pos
      FROM c
    )
    SELECT n_pos, n_neg, two_r_pos,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             cast(two_r_pos - n_pos * (n_pos + 1) as double)
             / (2.0e0 * cast(n_pos as double)
             * cast(n_neg as double)) END AS auc
    FROM agg
"""


@gate("auc_exact", _AUC_SQL)
def q_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_EV_SCORE).alias("v"),
        F.expr(_EV_LABEL_SP).alias("y"),
    )
    return ops_stats.auc_exact(ev, score="v", label="y")


# ---------------------------------------------------------------------------
# log_loss — rational bucket-rate predictions p = num/den
# ---------------------------------------------------------------------------
_LLQ = float(ops_stats.LL_Q)
_LL_NUM = f"(100 + {_EV_SCORE} // 2)"
_LL_NUM_SP = f"(100 + {_EV_SCORE} div 2)"
_LL_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_EV_LABEL} AS y,
             CAST({_LL_NUM} AS BIGINT) AS num,
             CAST(1000 AS BIGINT) AS den
      FROM events
    ),
    t AS (
      SELECT y,
             greatest(CAST(1 AS BIGINT),
                      least(num, den - 1)) AS nm,
             den
      FROM s
    ),
    terms AS (
      SELECT y,
             CAST(floor(ln(cast(den as double)
               / cast(nm as double))
               * {_LLQ!r}e0 + 0.5e0) AS BIGINT) AS l_pos,
             CAST(floor(ln(cast(den as double)
               / cast(den - nm as double))
               * {_LLQ!r}e0 + 0.5e0) AS BIGINT) AS l_neg
      FROM t
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y * l_pos + (1 - y) * l_neg) AS BIGINT)
               AS ll_q_sum
      FROM terms
    )
    SELECT n, ll_q_sum,
           CASE WHEN n > 0 THEN cast(ll_q_sum as double)
             / (cast(n as double) * {_LLQ!r}e0) END AS ll
    FROM agg
"""


@gate("log_loss", _LL_SQL)
def q_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_EV_LABEL_SP).alias("y"),
        F.expr(_LL_NUM_SP).cast("long").alias("num"),
        F.lit(1000).cast("long").alias("den"),
    )
    return ops_stats.log_loss(ev, label="y", p_num="num",
                              p_den="den")


# ---------------------------------------------------------------------------
# lift_curve — decile gains over the same score/label fixture
# ---------------------------------------------------------------------------
_LC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS i, {_EV_SCORE} AS sc, {_EV_LABEL} AS y
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT y,
             CAST(row_number() OVER (ORDER BY sc DESC, i ASC)
               AS BIGINT) - 1 AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM s
    ),
    bins AS (
      SELECT (rn * 10) // n AS bin,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(y) AS BIGINT) AS pos_b,
             CAST(max(n) AS BIGINT) AS n
      FROM base GROUP BY (rn * 10) // n
    ),
    cum AS (
      SELECT bin, n_b, pos_b,
             CAST(sum(n_b) OVER (ORDER BY bin ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
             CAST(sum(pos_b) OVER (ORDER BY bin ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
             CAST(max(n) OVER () AS BIGINT) AS n,
             CAST(sum(pos_b) OVER () AS BIGINT) AS p_all
      FROM bins
    )
    SELECT bin, n_b, pos_b, cum_n, cum_pos,
           CASE WHEN p_all > 0 THEN cast(cum_pos as double)
             / cast(p_all as double) END AS gain,
           CASE WHEN p_all > 0 AND cum_n > 0 THEN
             cast(cum_pos * n as double)
             / cast(cum_n * p_all as double) END AS lift
    FROM cum
"""


@gate("lift_curve", _LC_SQL)
def q_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("i"),
        F.expr(_EV_SCORE).alias("sc"),
        F.expr(_EV_LABEL_SP).alias("y"),
    )
    return ops_stats.lift_curve(
        ev, score="sc", label="y", id_col="i", n_bins=10
    )
