"""Gate registry extension 140 — shape-constrained batch: isotonic
minimax fit, Weibull median-rank fit, Grubbs' statistic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# isotonic_fit — minimax closed form on a 150-row events slice
# (O(n^3) block fan-out, the oracle-exact small-n path)
# ---------------------------------------------------------------------------
_ISO_FILTER = "event_id % 67 = 0"
_ISO_Q = ops_stats.ISO_Q
_ISO_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST(floor(value) AS BIGINT) AS y
      FROM events WHERE {_ISO_FILTER}
    ),
    idx AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY o ASC) AS BIGINT)
               AS i,
             y,
             CAST(sum(y) OVER (ORDER BY o ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
      FROM s
    ),
    pairs AS MATERIALIZED (
      SELECT a.i AS j, b.i AS kk,
             CAST(((b.p - (a.p - a.y))
               * CAST({_ISO_Q} AS BIGINT)) // (b.i - a.i + 1)
               AS BIGINT) AS avg_q
      FROM idx a JOIN idx b ON a.i <= b.i
    ),
    inner_min AS (
      SELECT m.i, pairs.j, CAST(min(pairs.avg_q) AS BIGINT) AS mn
      FROM pairs JOIN idx m
        ON pairs.j <= m.i AND m.i <= pairs.kk
      GROUP BY m.i, pairs.j
    ),
    fit AS (
      SELECT i, CAST(max(mn) AS BIGINT) AS fit_q
      FROM inner_min GROUP BY i
    )
    SELECT idx.i, idx.y, fit.fit_q
    FROM idx JOIN fit ON idx.i = fit.i
"""


@gate("isotonic_fit", _ISO_SQL)
def q_isotonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_ISO_FILTER).select(
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("y"),
    )
    return ops_stats.isotonic_fit(ev, order="o", value="y")


# ---------------------------------------------------------------------------
# weibull_fit — median-rank regression over shifted integer values
# ---------------------------------------------------------------------------
_WB_Q = float(ops_stats.WEIB_Q)
_WB_SHAPE = (
    "(cast(n * sxy - sx * sy as double)"
    " / cast(n * sxx - sx * sx as double))"
)
_WB_SCALE = (
    "exp((cast(sx as double) / cast(n as double)"
    " - (cast(sy as double) / cast(n as double))"
    f" / {_WB_SHAPE})"
    f" / {_WB_Q!r}e0)"
)
_WB_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT CAST(floor(value) AS BIGINT) + 1 AS v FROM events
    ),
    idx AS MATERIALIZED (
      SELECT v,
             CAST(row_number() OVER (ORDER BY v ASC) AS BIGINT)
               AS i,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM s
    ),
    ranked AS (
      SELECT CAST(floor(ln(cast(v as double))
               * {_WB_Q!r}e0 + 0.5e0) AS BIGINT) AS x_q,
             CAST(floor(ln(-ln(1.0e0
               - (cast(i as double) - 0.3e0)
               / (cast(n as double) + 0.4e0)))
               * {_WB_Q!r}e0 + 0.5e0) AS BIGINT) AS y_q
      FROM idx
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x_q) AS BIGINT) AS sx,
             CAST(sum(y_q) AS BIGINT) AS sy,
             CAST(sum(x_q * y_q) AS BIGINT) AS sxy,
             CAST(sum(x_q * x_q) AS BIGINT) AS sxx
      FROM ranked
    )
    SELECT n,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sxx - sx * sx AS BIGINT) AS den,
           CASE WHEN n * sxx - sx * sx <> 0
             THEN {_WB_SHAPE} END AS shape,
           CASE WHEN n * sxx - sx * sx <> 0
             AND cast(n * sxy - sx * sy as double) <> 0.0e0
             THEN round({_WB_SCALE}, 6) + 0.0e0 END AS scale_r
    FROM mom
"""


@gate("weibull_fit", _WB_SQL)
def q_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.expr("cast(floor(value) as bigint)") + 1).alias("v")
    )
    return ops_stats.weibull_fit(ev, value="v")


# ---------------------------------------------------------------------------
# grubbs_stat — max studentized deviate over integer-floored values
# ---------------------------------------------------------------------------
_GR_SQL = """
    WITH s AS MATERIALIZED (
      SELECT CAST(floor(value) AS BIGINT) AS x FROM events
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS ss
      FROM s
    ),
    d AS (
      SELECT CAST(max(abs(mom.n * s.x - mom.s)) AS BIGINT) AS maxd,
             CAST(max(mom.n) AS BIGINT) AS n,
             CAST(max(mom.n * mom.ss - mom.s * mom.s) AS BIGINT)
               AS nss_s2
      FROM s, mom
    )
    SELECT n, maxd, nss_s2,
           CASE WHEN nss_s2 > 0 AND n > 1 THEN
             (cast(maxd as double) / cast(n as double))
             / sqrt(cast(nss_s2 as double)
             / (cast(n as double) * (cast(n as double) - 1.0e0)))
             END AS g
    FROM d
"""


@gate("grubbs_stat", _GR_SQL)
def q_grubbs_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(floor(value) as bigint)").alias("x")
    )
    return ops_stats.grubbs_stat(ev, value="x")
