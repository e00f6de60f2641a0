"""Gate registry extension 141 — point-pattern-function batch:
G(r) nearest-neighbour CDF, bivariate Gcross, bivariate Kcross.
Brute-force oracles prove the 3x3 grid-bucket joins lossless."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import stats as ops_stats

_PF_Q = 1 << 10
_PF_RADII = [2048, 4096, 8192]
_PF_R_LIST = ", ".join(map(str, _PF_RADII))
_PF_MOD1 = "event_id % 7 = 0"
_PF_MOD2 = "event_id % 7 = 3"


def _pts_sql(pred: str) -> str:
    return f"""
      SELECT event_id AS pid,
             CAST(floor(({G.geo_lon('event_id')}) * {_PF_Q})
                  AS BIGINT) AS xq,
             CAST(floor(({G.geo_lat('event_id')}) * {_PF_Q})
                  AS BIGINT) AS yq
      FROM events WHERE {pred}
    """


def _pts_df(spark: SparkSession, sf_dir: str, pred: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(pred)
    return ops_h3.geocode(ev, "event_id")


# ---------------------------------------------------------------------------
# g_function — per-point brute-force NN distance, ladder counts
# ---------------------------------------------------------------------------
_GF_SQL = f"""
    WITH pts AS MATERIALIZED ({_pts_sql(_PF_MOD1)}),
    nnd AS MATERIALIZED (
      SELECT a.pid,
             CAST(min((a.xq - b.xq) * (a.xq - b.xq)
               + (a.yq - b.yq) * (a.yq - b.yq)) AS BIGINT) AS nnd2
      FROM pts a JOIN pts b ON a.pid <> b.pid
      GROUP BY a.pid
    ),
    n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts),
    counts AS (
      SELECT CAST(r.r AS BIGINT) AS r_q,
             CAST(count(*) AS BIGINT) AS n_le
      FROM nnd, (SELECT unnest([{_PF_R_LIST}]) AS r) r
      WHERE nnd.nnd2 <= r.r * r.r
      GROUP BY 1
    )
    SELECT r_q, n, n_le,
           cast(n_le as double) / cast(n as double) AS g_hat
    FROM counts, n_t
"""


@gate("g_function", _GF_SQL)
def q_g_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_stats.g_function(
        _pts_df(spark, sf_dir, _PF_MOD1), radii_q=_PF_RADII,
        id_col="event_id", coord_q=_PF_Q,
    )


# ---------------------------------------------------------------------------
# cross_g — type-1 -> nearest type-2 distance CDF
# ---------------------------------------------------------------------------
_CG_SQL = f"""
    WITH p1 AS MATERIALIZED ({_pts_sql(_PF_MOD1)}),
    p2 AS MATERIALIZED ({_pts_sql(_PF_MOD2)}),
    nnd AS MATERIALIZED (
      SELECT a.pid,
             CAST(min((a.xq - b.xq) * (a.xq - b.xq)
               + (a.yq - b.yq) * (a.yq - b.yq)) AS BIGINT) AS nnd2
      FROM p1 a JOIN p2 b ON TRUE
      GROUP BY a.pid
    ),
    n_t AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM p1),
    counts AS (
      SELECT CAST(r.r AS BIGINT) AS r_q,
             CAST(count(*) AS BIGINT) AS n_le
      FROM nnd, (SELECT unnest([{_PF_R_LIST}]) AS r) r
      WHERE nnd.nnd2 <= r.r * r.r
      GROUP BY 1
    )
    SELECT r_q, n1, n_le,
           cast(n_le as double) / cast(n1 as double) AS g12_hat
    FROM counts, n_t
"""


@gate("cross_g", _CG_SQL)
def q_cross_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_stats.cross_g(
        _pts_df(spark, sf_dir, _PF_MOD1),
        _pts_df(spark, sf_dir, _PF_MOD2),
        radii_q=_PF_RADII,
        id_left="event_id", id_right="event_id", coord_q=_PF_Q,
    )


# ---------------------------------------------------------------------------
# cross_k — ordered cross-pair counts per radius
# ---------------------------------------------------------------------------
_CK_SQL = f"""
    WITH p1 AS MATERIALIZED ({_pts_sql(_PF_MOD1)}),
    p2 AS MATERIALIZED ({_pts_sql(_PF_MOD2)}),
    pr AS MATERIALIZED (
      SELECT (a.xq - b.xq) * (a.xq - b.xq)
             + (a.yq - b.yq) * (a.yq - b.yq) AS d2
      FROM p1 a JOIN p2 b ON TRUE
    )
    SELECT CAST(r.r AS BIGINT) AS r_q,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pr, (SELECT unnest([{_PF_R_LIST}]) AS r) r
    WHERE pr.d2 <= r.r * r.r
    GROUP BY 1
"""


@gate("cross_k", _CK_SQL)
def q_cross_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_stats.cross_k(
        _pts_df(spark, sf_dir, _PF_MOD1),
        _pts_df(spark, sf_dir, _PF_MOD2),
        radii_q=_PF_RADII,
        id_left="event_id", id_right="event_id", coord_q=_PF_Q,
    )
