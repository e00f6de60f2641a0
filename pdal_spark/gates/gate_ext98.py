"""Gate registry extension 98 — discrete Frechet trajectory pairs,
k-anonymity/l-diversity audit, spatial k-anonymity geo-masking."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import temporal as ops_temporal
from pdal_spark.operators import textops as ops_text

_LAT = G.geo_lat("event_id")
_LON = G.geo_lon("event_id")

# ---------------------------------------------------------------------------
# frechet_pairs — discrete Frechet (squared) between first-16-point
# user trajectories on the 2^-20-degree grid, blocked by user % 12.
# Oracle: anti-diagonal LIST recursion (the dtw_pairs convention);
# INF sentinels keep every list full-length, and the boundary cells
# fall out of least() via NULL-skipping out-of-range list indexes.
# ---------------------------------------------------------------------------
_FR_T = 16
_FR_BLOCKS = 12
_FR_Q = 1 << 20
_FR_INF = 1 << 62


def _fr_sql() -> str:
    T = _FR_T
    smax = 2 * T - 2

    def c(i: str, j: str) -> str:
        return (
            f"((xa[{i} + 1] - xb[{j} + 1]) * (xa[{i} + 1] - xb[{j} + 1])"
            f" + (ya[{i} + 1] - yb[{j} + 1])"
            f" * (ya[{i} + 1] - yb[{j} + 1]))"
        )

    up = "cur[x]"        # dp(i-1, s-i)   at s (x = i 1-based -> i-1+1)
    left = "cur[x + 1]"  # dp(i,   s-i)   at s
    diag = "prv[x]"      # dp(i-1, s-1-i) at s-1
    step = (
        f"list_transform(range(0, {T}), x -> CASE"
        f" WHEN x <= s + 1 AND s + 1 - x <= {T - 1}"
        f" THEN greatest({c('x', '(s + 1 - x)')},"
        f" least({up}, {left}, {diag}))"
        f" ELSE {_FR_INF} END)"
    )
    return f"""
    WITH RECURSIVE pts AS MATERIALIZED (
      SELECT user_id AS k, user_id % {_FR_BLOCKS} AS b, event_id AS e,
             CAST(floor(({_LON}) * {_FR_Q}) AS BIGINT) AS xq,
             CAST(floor(({_LAT}) * {_FR_Q}) AS BIGINT) AS yq,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY event_id) AS rn
      FROM events
    ),
    ser AS MATERIALIZED (
      SELECT k, b, list(xq ORDER BY e) AS xs, list(yq ORDER BY e) AS ys
      FROM pts WHERE rn <= {_FR_T} GROUP BY k, b
    ),
    pairs AS MATERIALIZED (
      SELECT a.k AS ka, b.k AS kb, a.b AS blk,
             a.xs AS xa, a.ys AS ya, b.xs AS xb, b.ys AS yb
      FROM ser a JOIN ser b ON a.b = b.b AND a.k < b.k
    ),
    dp AS (
      SELECT ka, kb, blk, xa, ya, xb, yb, 0 AS s,
             list_transform(range(0, {T}), x -> CASE WHEN x = 0
               THEN {c('0', '0')} ELSE {_FR_INF} END) AS cur,
             list_transform(range(0, {T}),
                            x -> {_FR_INF}) AS prv
      FROM pairs
      UNION ALL
      SELECT ka, kb, blk, xa, ya, xb, yb, s + 1, {step}, cur
      FROM dp WHERE s < {smax}
    )
    SELECT ka AS key_a, kb AS key_b, blk,
           CAST(cur[{T}] AS BIGINT) AS f2
    FROM dp WHERE s = {smax}
    """


@gate("frechet_pairs", _fr_sql())
def q_frechet_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")
    w = Window.partitionBy("user_id").orderBy("event_id")
    traj = (
        pts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _FR_T)
        .select(
            "user_id", "event_id",
            (F.col("user_id") % _FR_BLOCKS).alias("blk"),
            F.floor(F.col("lon") * _FR_Q).cast("long").alias("xq"),
            F.floor(F.col("lat") * _FR_Q).cast("long").alias("yq"),
        )
    )
    return ops_temporal.frechet_pairs(
        traj, key="user_id", order="event_id", x="xq", y="yq",
        block="blk",
    )


# ---------------------------------------------------------------------------
# k_anonymity — QI audit over (event_type, user bucket); sensitive
# column = props (the per-event payload)
# ---------------------------------------------------------------------------
_KA_K = 5
_KA_L = 3

_KA_SQL = f"""
    SELECT event_type, user_id % 16 AS ubucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT props) AS BIGINT) AS n_sensitive,
           CASE WHEN count(*) < {_KA_K} THEN 1 ELSE 0 END AS k_risky,
           CASE WHEN count(DISTINCT props) < {_KA_L} THEN 1 ELSE 0 END
             AS l_risky
    FROM events GROUP BY 1, 2
"""


@gate("k_anonymity", _KA_SQL)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "ubucket", F.col("user_id") % 16
    )
    return ops_text.k_anonymity(
        ev, ["event_type", "ubucket"], k=_KA_K,
        sensitive="props", l_div=_KA_L,
    )


# ---------------------------------------------------------------------------
# geo_k_anonymize — adaptive-resolution geo-masking until every
# published cell holds >= k points
# ---------------------------------------------------------------------------
_GA_K = 10
_GA_R = 12

_GA_SQL = f"""
    WITH base AS MATERIALIZED (
      SELECT event_id AS pid,
             {G.qcell_ix(_LON, _GA_R)} AS ix,
             {G.qcell_iy(_LAT, _GA_R)} AS iy
      FROM events
    ),
    ladder AS MATERIALIZED (
      SELECT pid, r,
             ix // (CAST(1 AS BIGINT) << ({_GA_R} - r)) AS cx,
             iy // (CAST(1 AS BIGINT) << ({_GA_R} - r)) AS cy
      FROM base, (SELECT unnest(range({_GA_R + 1})) AS r) rs
    ),
    counts AS (
      SELECT r, cx, cy, count(*) AS cnt
      FROM ladder GROUP BY 1, 2, 3
    ),
    best AS (
      SELECT pid, max(l.r) AS ru
      FROM ladder l JOIN counts c USING (r, cx, cy)
      WHERE cnt >= {_GA_K} GROUP BY pid
    )
    SELECT b.pid AS event_id,
           CAST(coalesce(ru, -1) AS BIGINT) AS res_used,
           ix // (CAST(1 AS BIGINT) << ({_GA_R} - ru)) AS cix,
           iy // (CAST(1 AS BIGINT) << ({_GA_R} - ru)) AS ciy
    FROM base b LEFT JOIN best USING (pid)
"""


@gate("geo_k_anonymize", _GA_SQL)
def q_geo_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = ops_h3.geocode(_t(spark, sf_dir, "events"), "event_id")
    return ops_h3.geo_k_anonymize(
        pts, x="lon", y="lat", id_col="event_id",
        k=_GA_K, max_res=_GA_R,
    )
