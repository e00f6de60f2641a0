"""Gate registry extension 113 — forecast-eval/robust-location
batch: Brier decomposition, trimmed mean, quantile
normalization."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# brier_score — hash probabilities vs a correlated binary label
# ---------------------------------------------------------------------------
_BQ = ops_stats.BRIER_Q
_BR_P = f"({G.lehmer2('event_id')} % {_BQ + 1})"
_BR_Y = (
    f"(CASE WHEN ({G.lehmer2('event_id * 3 + 1')} % {_BQ})"
    f" < {_BR_P} THEN 1 ELSE 0 END)"
)
_BR_BINS = 10
_BR_W = _BQ // _BR_BINS
_BR_SQL = f"""
    WITH base AS MATERIALIZED (
      SELECT {_BR_P} AS p, {_BR_Y} AS y FROM events
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum((p - {_BQ} * y) * (p - {_BQ} * y))
               AS BIGINT) AS se_sum
      FROM base
    ),
    bins AS (
      SELECT p // {_BR_W} AS bin, CAST(count(*) AS BIGINT) AS n_k,
             CAST(sum(p) AS BIGINT) AS sp,
             CAST(sum(y) AS BIGINT) AS sy
      FROM base GROUP BY 1
    ),
    dec AS (
      SELECT CAST(sum(((sp - {_BQ} * sy) * (sp - {_BQ} * sy))
               // n_k) AS BIGINT) AS rel_q,
             CAST(sum(cast(floor((cast(n * sy - n_k * n_pos
                    as double)
                  * cast(n * sy - n_k * n_pos as double)
                  / (cast(n_k as double) * cast(n as double)
                     * cast(n as double)))
                  * cast({1 << 40} as double) + 0.5e0) as bigint))
               AS BIGINT) AS res_q
      FROM bins, tot
    )
    SELECT n, n_pos,
           cast(se_sum as double)
             / (cast(n as double) * {float(_BQ)}e0 * {float(_BQ)}e0)
             AS bs,
           cast(rel_q as double)
             / (cast(n as double) * {float(_BQ)}e0 * {float(_BQ)}e0)
             AS reliability,
           cast(res_q as double)
             / (cast({1 << 40} as double) * cast(n as double))
             AS resolution,
           (cast(n_pos as double) / cast(n as double))
             * (1.0e0 - cast(n_pos as double) / cast(n as double))
             AS uncertainty
    FROM tot, dec
"""


@gate("brier_score", _BR_SQL)
def q_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_BR_P).alias("prob_q"),
        F.expr(_BR_Y).alias("label"),
    )
    return ops_stats.brier_score(ev, n_bins=_BR_BINS)


# ---------------------------------------------------------------------------
# trimmed_mean — per-cohort 10%-trimmed value mean
# ---------------------------------------------------------------------------
_TM_SQL = """
    WITH r AS MATERIALIZED (
      SELECT user_id % 23 AS k, event_id % 1000 AS v, event_id AS id,
             row_number() OVER (PARTITION BY user_id % 23
               ORDER BY event_id % 1000, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id % 23) AS n
      FROM events
    ),
    kept AS (
      SELECT k, v, n FROM r
      WHERE rn > (n * 10) // 100 AND rn <= n - (n * 10) // 100
    ),
    agg AS (
      SELECT k, CAST(max(n) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(v) AS BIGINT) AS kept_sum
      FROM kept GROUP BY k HAVING count(*) > 0
    )
    SELECT k AS user_id, n, n_kept, kept_sum,
           cast(kept_sum as double) / cast(n_kept as double)
             AS tmean
    FROM agg
"""


@gate("trimmed_mean", _TM_SQL)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 23).alias("k"),
        (F.col("event_id") % 1000).alias("v"),
        F.col("event_id").alias("id"),
    )
    return ops_stats.trimmed_mean(
        ev, key="k", value="v", id_col="id", trim_pct=10
    ).select(F.col("k").alias("user_id"), "n", "n_kept",
             "kept_sum", "tmean")


# ---------------------------------------------------------------------------
# quantile_normalize — equal-size groups by construction
# (event_id % 4 slices the contiguous id range evenly at every sf)
# ---------------------------------------------------------------------------
_QN_Q = ops_stats.QN_Q
_QN_SQL = f"""
    WITH r AS MATERIALIZED (
      SELECT event_id % 4 AS g, {G.lehmer2('event_id')} % 5000 AS v,
             event_id AS id,
             row_number() OVER (PARTITION BY event_id % 4
               ORDER BY {G.lehmer2('event_id')} % 5000, event_id)
               AS rank
      FROM events
    ),
    ref AS (
      SELECT rank,
             (CAST(sum(v) AS BIGINT) * {_QN_Q}) // 4 AS qn_q
      FROM r GROUP BY rank
    )
    SELECT r.g, r.id, CAST(r.rank AS BIGINT) AS rank, ref.qn_q
    FROM r JOIN ref USING (rank)
"""


@gate("quantile_normalize", _QN_SQL)
def q_quantile_normalize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % 4).alias("g"),
        (F.expr(G.lehmer2("event_id")) % 5000).alias("v"),
        F.col("event_id").alias("id"),
    )
    out = ops_stats.quantile_normalize(
        ev, group="g", value="v", id_col="id"
    )
    return out.select(
        "g", "id", F.col("rank").cast("long").alias("rank"), "qn_q"
    )
