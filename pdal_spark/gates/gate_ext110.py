"""Gate registry extension 110 — robust-statistics batch: Spearman
rank correlation, Simpson diversity / Hill-2, hash-deterministic
RANSAC line fit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import features as ops_features
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# spearman_corr — monotone-plus-noise pair with ties
# ---------------------------------------------------------------------------
_SP_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 23 AS k,
             event_id % 101 AS a,
             (event_id % 101) * 3 + event_id % 13 AS b
      FROM events
    ),
    r AS (
      SELECT k,
             CAST(2 * rank() OVER (PARTITION BY k ORDER BY a)
                  + count(*) OVER (PARTITION BY k, a) - 1
               AS BIGINT) AS ra2,
             CAST(2 * rank() OVER (PARTITION BY k ORDER BY b)
                  + count(*) OVER (PARTITION BY k, b) - 1
               AS BIGINT) AS rb2
      FROM s
    ),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ra2) AS BIGINT) AS sa,
             CAST(sum(rb2) AS BIGINT) AS sb,
             CAST(sum(ra2 * ra2) AS BIGINT) AS saa,
             CAST(sum(rb2 * rb2) AS BIGINT) AS sbb,
             CAST(sum(ra2 * rb2) AS BIGINT) AS sab
      FROM r GROUP BY k
    )
    SELECT k AS user_id, n,
           case when n * saa - sa * sa > 0
             and n * sbb - sb * sb > 0 then
             (cast(n as double) * cast(sab as double)
              - cast(sa as double) * cast(sb as double))
             / (sqrt(cast(n as double) * cast(saa as double)
                - cast(sa as double) * cast(sa as double))
                * sqrt(cast(n as double) * cast(sbb as double)
                - cast(sb as double) * cast(sb as double))) end
             AS rho
    FROM agg
"""


@gate("spearman_corr", _SP_SQL)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 23).alias("k"),
        (F.col("event_id") % 101).alias("a"),
        ((F.col("event_id") % 101) * 3 + F.col("event_id") % 13)
        .alias("b"),
    )
    return ops_stats.spearman_corr(ev, key="k", a="a", b="b").select(
        F.col("k").alias("user_id"), "n", "rho"
    )


# ---------------------------------------------------------------------------
# simpson_diversity — event-type mix per user cohort
# ---------------------------------------------------------------------------
_SI_SQL = """
    WITH cnt AS MATERIALIZED (
      SELECT user_id % 23 AS k, event_type,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    agg AS (
      SELECT k, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c * (c - 1)) AS BIGINT) AS pairs_same
      FROM cnt GROUP BY k HAVING sum(c) >= 2
    )
    SELECT k AS user_id, n, pairs_same,
           1.0e0 - cast(pairs_same as double)
             / (cast(n as double) * (cast(n as double) - 1.0e0))
             AS simpson,
           case when pairs_same > 0 then
             cast(n as double) * (cast(n as double) - 1.0e0)
             / cast(pairs_same as double) end AS hill2
    FROM agg
"""


@gate("simpson_diversity", _SI_SQL)
def q_simpson_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 23).alias("k"), "event_type"
    )
    return ops_stats.simpson_diversity(
        ev, group_col="k", cat_col="event_type"
    ).select(F.col("k").alias("user_id"), "n", "pairs_same",
             "simpson", "hill2")


# ---------------------------------------------------------------------------
# ransac_line — 70% of points on y = 3x + 7 (small hash jitter),
# 30% scattered outliers
# ---------------------------------------------------------------------------
_RL_PX = f"({G.lehmer2('event_id')} % 10000)"
_RL_PY = (
    f"(CASE WHEN event_id % 10 < 7 THEN"
    f" 3 * ({_RL_PX}) + 7 + ({G.lehmer2('event_id * 3 + 1')} % 5) - 2"
    f" ELSE {G.lehmer2('event_id * 5 + 2')} % 30000 END)"
)
_RL_NB = 64
_RL_NC = 16
_RL_TOL = 10
_RL_SQL = f"""
    WITH p AS MATERIALIZED (
      SELECT event_id AS pid, {_RL_PX} AS px, {_RL_PY} AS py
      FROM events
    ),
    mins AS (
      SELECT pid % {_RL_NB} AS bk, min(pid) AS mid
      FROM p GROUP BY 1
    ),
    anchors AS (
      SELECT bk, px AS ax, py AS ay
      FROM mins JOIN p ON p.pid = mins.mid
    ),
    cr AS (SELECT unnest(range({_RL_NC})) AS id),
    cands AS (
      SELECT cr.id AS cand, a1.ax AS x1, a1.ay AS y1,
             a2.ax AS x2, a2.ay AS y2
      FROM cr
      JOIN anchors a1 ON a1.bk = ({G.mix_hash('id * 2')}) % {_RL_NB}
      JOIN anchors a2
        ON a2.bk = ({G.mix_hash('id * 2 + 1')}) % {_RL_NB}
      WHERE NOT (a1.ax = a2.ax AND a1.ay = a2.ay)
    ),
    scored AS (
      SELECT cand, x1, y1, x2, y2, CAST(count(*) AS BIGINT)
               AS n_inliers
      FROM p, cands
      WHERE abs((py - y1) * (x2 - x1) - (px - x1) * (y2 - y1))
            <= {_RL_TOL} * greatest(abs(x2 - x1), abs(y2 - y1))
      GROUP BY cand, x1, y1, x2, y2
    )
    SELECT cand, x1, y1, x2, y2, n_inliers,
           row_number() OVER (ORDER BY n_inliers DESC, cand ASC) = 1
             AS best
    FROM scored
"""


@gate("ransac_line", _RL_SQL)
def q_ransac_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("pid"),
        F.expr(_RL_PX).alias("mx"),
        F.expr(_RL_PY).alias("my"),
    )
    return ops_features.ransac_line(
        ev, id_col="pid", x="mx", y="my",
        n_cand=_RL_NC, tol=_RL_TOL, buckets=_RL_NB,
    )
