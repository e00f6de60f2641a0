"""Gate registry extension 112 — lead-lag/confounding batch:
cross-correlation function, Granger lag-1 causality, partial
correlation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# ccf — x leads a shifted copy of itself across user cohorts
# ---------------------------------------------------------------------------
_CC_LAGS = 4


def _ccf_sql() -> str:
    leads = ",\n             ".join(
        f"lead(dy, {k}) OVER w AS l{k}" for k in range(1, _CC_LAGS + 1)
    )
    nums = ",\n             ".join(
        [f"CAST(sum(dx * dy) AS BIGINT) AS n0"]
        + [f"CAST(sum(dx * l{k}) AS BIGINT) AS n{k}"
           for k in range(1, _CC_LAGS + 1)]
    )
    case = " ".join(
        f"WHEN {k} THEN coalesce(n{k}, 0)"
        for k in range(_CC_LAGS + 1)
    )
    lag_vals = ", ".join(f"({k})" for k in range(_CC_LAGS + 1))
    return f"""
    WITH base AS MATERIALIZED (
      SELECT user_id % 17 AS k, event_id AS o,
             event_id % 13 AS vx, (event_id + 3) % 13 AS vy
      FROM events
    ),
    mom AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vx) AS BIGINT) AS sx,
             CAST(sum(vy) AS BIGINT) AS sy
      FROM base GROUP BY k
    ),
    dev AS (
      SELECT base.k, o, n * vx - sx AS dx, n * vy - sy AS dy
      FROM base JOIN mom ON mom.k = base.k
    ),
    leads AS (
      SELECT k, dx, dy,
             {leads}
      FROM dev
      WINDOW w AS (PARTITION BY k ORDER BY o)
    ),
    agg AS (
      SELECT k,
             CAST(sum(dx * dx) AS BIGINT) AS den_x,
             CAST(sum(dy * dy) AS BIGINT) AS den_y,
             {nums}
      FROM leads GROUP BY k
    )
    SELECT k AS user_id, CAST(l.lag AS INT) AS lag,
           CASE l.lag {case} END AS num,
           den_x, den_y,
           case when den_x > 0 and den_y > 0 then
             cast(CASE l.lag {case} END as double)
             / (sqrt(cast(den_x as double))
                * sqrt(cast(den_y as double))) end AS r
    FROM agg, (VALUES {lag_vals}) l(lag)
    """


@gate("ccf", _ccf_sql())
def q_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 17).alias("k"),
        F.col("event_id").alias("o"),
        (F.col("event_id") % 13).alias("vx"),
        ((F.col("event_id") + 3) % 13).alias("vy"),
    )
    out = ops_temporal.ccf(
        ev, key="k", order="o", x="vx", y="vy", max_lag=_CC_LAGS
    )
    return out.select(
        F.col("k").alias("user_id"),
        F.col("lag").cast("int").alias("lag"),
        "num", "den_x", "den_y", "r",
    )


# ---------------------------------------------------------------------------
# granger_lag1 — does vx's history predict vy beyond vy's own
# ---------------------------------------------------------------------------
_GR_SQL = """
    WITH base AS MATERIALIZED (
      SELECT user_id % 17 AS k, event_id AS o,
             event_id % 13 AS vx, (event_id * 5) % 11 AS vy
      FROM events
    ),
    lagged AS (
      SELECT k, vy AS yt,
             lag(vy) OVER w AS y1, lag(vx) OVER w AS x1
      FROM base
      WINDOW w AS (PARTITION BY k ORDER BY o)
    ),
    m AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(yt) AS BIGINT) AS sy,
             CAST(sum(y1) AS BIGINT) AS s1,
             CAST(sum(x1) AS BIGINT) AS s2,
             CAST(sum(yt * yt) AS BIGINT) AS syy,
             CAST(sum(y1 * y1) AS BIGINT) AS s11,
             CAST(sum(x1 * x1) AS BIGINT) AS s22,
             CAST(sum(yt * y1) AS BIGINT) AS sy1,
             CAST(sum(yt * x1) AS BIGINT) AS sy2,
             CAST(sum(y1 * x1) AS BIGINT) AS s12
      FROM lagged WHERE y1 IS NOT NULL AND x1 IS NOT NULL
      GROUP BY k
    )
    SELECT k AS user_id, n,
           case when n > 3 and ((cast(n as double) * cast(s11 as double) - cast(s1 as double) * cast(s1 as double)) * (cast(n as double) * cast(s22 as double) - cast(s2 as double) * cast(s2 as double)) - (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double)) * (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double))) <> 0.0e0
             and ((cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double)) - ((cast(n as double) * cast(s22 as double) - cast(s2 as double) * cast(s2 as double)) * (cast(n as double) * cast(sy1 as double) - cast(sy as double) * cast(s1 as double)) - (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double)) * (cast(n as double) * cast(sy2 as double) - cast(sy as double) * cast(s2 as double))) / ((cast(n as double) * cast(s11 as double) - cast(s1 as double) * cast(s1 as double)) * (cast(n as double) * cast(s22 as double) - cast(s2 as double) * cast(s2 as double)) - (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double)) * (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double))) * (cast(n as double) * cast(sy1 as double) - cast(sy as double) * cast(s1 as double)) - ((cast(n as double) * cast(s11 as double) - cast(s1 as double) * cast(s1 as double)) * (cast(n as double) * cast(sy2 as double) - cast(sy as double) * cast(s2 as double)) - (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double)) * (cast(n as double) * cast(sy1 as double) - cast(sy as double) * cast(s1 as double))) / ((cast(n as double) * cast(s11 as double) - cast(s1 as double) * cast(s1 as double)) * (cast(n as double) * cast(s22 as double) - cast(s2 as double) * cast(s2 as double)) - (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double)) * (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double))) * (cast(n as double) * cast(sy2 as double) - cast(sy as double) * cast(s2 as double))) > 0.0e0 then
             (((cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double)) - case when (cast(n as double) * cast(s11 as double) - cast(s1 as double) * cast(s1 as double)) > 0 then (cast(n as double) * cast(sy1 as double) - cast(sy as double) * cast(s1 as double)) * (cast(n as double) * cast(sy1 as double) - cast(sy as double) * cast(s1 as double)) / (cast(n as double) * cast(s11 as double) - cast(s1 as double) * cast(s1 as double)) else 0.0e0 end) - ((cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double)) - ((cast(n as double) * cast(s22 as double) - cast(s2 as double) * cast(s2 as double)) * (cast(n as double) * cast(sy1 as double) - cast(sy as double) * cast(s1 as double)) - (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double)) * (cast(n as double) * cast(sy2 as double) - cast(sy as double) * cast(s2 as double))) / ((cast(n as double) * cast(s11 as double) - cast(s1 as double) * cast(s1 as double)) * (cast(n as double) * cast(s22 as double) - cast(s2 as double) * cast(s2 as double)) - (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double)) * (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double))) * (cast(n as double) * cast(sy1 as double) - cast(sy as double) * cast(s1 as double)) - ((cast(n as double) * cast(s11 as double) - cast(s1 as double) * cast(s1 as double)) * (cast(n as double) * cast(sy2 as double) - cast(sy as double) * cast(s2 as double)) - (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double)) * (cast(n as double) * cast(sy1 as double) - cast(sy as double) * cast(s1 as double))) / ((cast(n as double) * cast(s11 as double) - cast(s1 as double) * cast(s1 as double)) * (cast(n as double) * cast(s22 as double) - cast(s2 as double) * cast(s2 as double)) - (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double)) * (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double))) * (cast(n as double) * cast(sy2 as double) - cast(sy as double) * cast(s2 as double))))
             / (((cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double)) - ((cast(n as double) * cast(s22 as double) - cast(s2 as double) * cast(s2 as double)) * (cast(n as double) * cast(sy1 as double) - cast(sy as double) * cast(s1 as double)) - (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double)) * (cast(n as double) * cast(sy2 as double) - cast(sy as double) * cast(s2 as double))) / ((cast(n as double) * cast(s11 as double) - cast(s1 as double) * cast(s1 as double)) * (cast(n as double) * cast(s22 as double) - cast(s2 as double) * cast(s2 as double)) - (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double)) * (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double))) * (cast(n as double) * cast(sy1 as double) - cast(sy as double) * cast(s1 as double)) - ((cast(n as double) * cast(s11 as double) - cast(s1 as double) * cast(s1 as double)) * (cast(n as double) * cast(sy2 as double) - cast(sy as double) * cast(s2 as double)) - (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double)) * (cast(n as double) * cast(sy1 as double) - cast(sy as double) * cast(s1 as double))) / ((cast(n as double) * cast(s11 as double) - cast(s1 as double) * cast(s1 as double)) * (cast(n as double) * cast(s22 as double) - cast(s2 as double) * cast(s2 as double)) - (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double)) * (cast(n as double) * cast(s12 as double) - cast(s1 as double) * cast(s2 as double))) * (cast(n as double) * cast(sy2 as double) - cast(sy as double) * cast(s2 as double))) / (cast(n as double) - 3.0e0)) end AS f_stat
    FROM m
"""


@gate("granger_lag1", _GR_SQL)
def q_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 17).alias("k"),
        F.col("event_id").alias("o"),
        (F.col("event_id") % 13).alias("vx"),
        ((F.col("event_id") * 5) % 11).alias("vy"),
    )
    return ops_temporal.granger_lag1(
        ev, key="k", order="o", x="vx", y="vy"
    ).select(F.col("k").alias("user_id"), "n", "f_stat")


# ---------------------------------------------------------------------------
# partial_correlation — shared-driver confound
# ---------------------------------------------------------------------------
_PC_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 17 AS k,
             event_id % 23 + event_id % 9 AS vx,
             event_id % 19 + event_id % 9 AS vy,
             event_id % 9 AS vz
      FROM events
    ),
    m AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vx) AS BIGINT) AS sx,
             CAST(sum(vy) AS BIGINT) AS sy,
             CAST(sum(vz) AS BIGINT) AS sz,
             CAST(sum(vx * vx) AS BIGINT) AS sxx,
             CAST(sum(vy * vy) AS BIGINT) AS syy,
             CAST(sum(vz * vz) AS BIGINT) AS szz,
             CAST(sum(vx * vy) AS BIGINT) AS sxy,
             CAST(sum(vx * vz) AS BIGINT) AS sxz,
             CAST(sum(vy * vz) AS BIGINT) AS syz
      FROM s GROUP BY k
    )
    SELECT k AS user_id, n,
           case when (cast(n as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double)) > 0
             and (cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double)) > 0
             and (cast(n as double) * cast(szz as double) - cast(sz as double) * cast(sz as double)) > 0
             and (1.0e0 - ((cast(n as double) * cast(sxz as double) - cast(sx as double) * cast(sz as double)) / (sqrt((cast(n as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double))) * sqrt((cast(n as double) * cast(szz as double) - cast(sz as double) * cast(sz as double))))) * ((cast(n as double) * cast(sxz as double) - cast(sx as double) * cast(sz as double)) / (sqrt((cast(n as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double))) * sqrt((cast(n as double) * cast(szz as double) - cast(sz as double) * cast(sz as double)))))) > 0.0e0
             and (1.0e0 - ((cast(n as double) * cast(syz as double) - cast(sy as double) * cast(sz as double)) / (sqrt((cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double))) * sqrt((cast(n as double) * cast(szz as double) - cast(sz as double) * cast(sz as double))))) * ((cast(n as double) * cast(syz as double) - cast(sy as double) * cast(sz as double)) / (sqrt((cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double))) * sqrt((cast(n as double) * cast(szz as double) - cast(sz as double) * cast(sz as double)))))) > 0.0e0 then
             (((cast(n as double) * cast(sxy as double) - cast(sx as double) * cast(sy as double)) / (sqrt((cast(n as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double))) * sqrt((cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double))))) - ((cast(n as double) * cast(sxz as double) - cast(sx as double) * cast(sz as double)) / (sqrt((cast(n as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double))) * sqrt((cast(n as double) * cast(szz as double) - cast(sz as double) * cast(sz as double))))) * ((cast(n as double) * cast(syz as double) - cast(sy as double) * cast(sz as double)) / (sqrt((cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double))) * sqrt((cast(n as double) * cast(szz as double) - cast(sz as double) * cast(sz as double))))))
             / sqrt((1.0e0 - ((cast(n as double) * cast(sxz as double) - cast(sx as double) * cast(sz as double)) / (sqrt((cast(n as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double))) * sqrt((cast(n as double) * cast(szz as double) - cast(sz as double) * cast(sz as double))))) * ((cast(n as double) * cast(sxz as double) - cast(sx as double) * cast(sz as double)) / (sqrt((cast(n as double) * cast(sxx as double) - cast(sx as double) * cast(sx as double))) * sqrt((cast(n as double) * cast(szz as double) - cast(sz as double) * cast(sz as double))))))
                    * (1.0e0 - ((cast(n as double) * cast(syz as double) - cast(sy as double) * cast(sz as double)) / (sqrt((cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double))) * sqrt((cast(n as double) * cast(szz as double) - cast(sz as double) * cast(sz as double))))) * ((cast(n as double) * cast(syz as double) - cast(sy as double) * cast(sz as double)) / (sqrt((cast(n as double) * cast(syy as double) - cast(sy as double) * cast(sy as double))) * sqrt((cast(n as double) * cast(szz as double) - cast(sz as double) * cast(sz as double))))))) end
             AS r_xy_z
    FROM m
"""


@gate("partial_correlation", _PC_SQL)
def q_partial_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 17).alias("k"),
        (F.col("event_id") % 23 + F.col("event_id") % 9).alias("vx"),
        (F.col("event_id") % 19 + F.col("event_id") % 9).alias("vy"),
        (F.col("event_id") % 9).alias("vz"),
    )
    return ops_stats.partial_correlation(
        ev, key="k", x="vx", y="vy", z="vz"
    ).select(F.col("k").alias("user_id"), "n", "r_xy_z")
