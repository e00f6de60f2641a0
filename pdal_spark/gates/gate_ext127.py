"""Gate registry extension 127 — curve/variance batch: knee-point
detection and one-way ANOVA F."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# knee_point — per-cohort saturating count curve (rank vs cumulated
# hash mass: a heavy-tail curve with a real bend)
# ---------------------------------------------------------------------------
_KN_SQL = """
    WITH base AS MATERIALIZED (
      SELECT user_id % 17 AS k, event_id % 40 AS x,
             CAST(sum(sum(CASE WHEN event_id % 3 = 0 THEN 9
                          ELSE 1 END)) OVER (
               PARTITION BY user_id % 17 ORDER BY event_id % 40)
               AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    ex AS (
      SELECT k, min(x) AS x1, max(x) AS xn,
             CAST(count(*) AS BIGINT) AS n
      FROM base GROUP BY k
    ),
    y1t AS (
      SELECT base.k, min(y) AS y1
      FROM base JOIN ex ON ex.k = base.k AND base.x = ex.x1
      GROUP BY base.k
    ),
    ynt AS (
      SELECT base.k, min(y) AS yn
      FROM base JOIN ex ON ex.k = base.k AND base.x = ex.xn
      GROUP BY base.k
    ),
    j AS (
      SELECT base.k, x, y, x1, xn, n, y1, yn,
             abs((y - y1) * (xn - x1) - (x - x1) * (yn - y1))
               AS cr
      FROM base JOIN ex ON ex.k = base.k
      JOIN y1t ON y1t.k = base.k JOIN ynt ON ynt.k = base.k
    ),
    mx AS (
      SELECT k, CAST(max(cr) AS BIGINT) AS cross_abs
      FROM j GROUP BY k
    ),
    hit AS (
      SELECT j.k, cross_abs, CAST(min(x) AS BIGINT) AS knee_x,
             CAST(max(n) AS BIGINT) AS n
      FROM j JOIN mx ON mx.k = j.k AND j.cr = mx.cross_abs
      GROUP BY j.k, cross_abs
    ),
    ky AS (
      SELECT j.k, CAST(min(y) AS BIGINT) AS knee_y
      FROM j JOIN mx ON mx.k = j.k AND j.cr = mx.cross_abs
      JOIN hit ON hit.k = j.k AND j.x = hit.knee_x
      GROUP BY j.k
    )
    SELECT hit.k AS user_id, knee_x, knee_y, cross_abs, n
    FROM hit JOIN ky ON ky.k = hit.k
"""


@gate("knee_point", _KN_SQL)
def q_knee_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy(
        (F.col("user_id") % 17).alias("k"),
        (F.col("event_id") % 40).alias("x"),
    ).agg(
        F.sum(
            F.when(F.col("event_id") % 3 == 0, 9).otherwise(1)
        ).alias("w")
    )
    wcum = (
        Window.partitionBy("k").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = per.select(
        "k", "x", F.sum("w").over(wcum).cast("long").alias("y")
    )
    return ops_stats.knee_point(curve, key="k", x="x", y="y").select(
        F.col("k").alias("user_id"), "knee_x", "knee_y",
        "cross_abs", "n",
    )


# ---------------------------------------------------------------------------
# anova_f — do per-cohort value means differ (unbalanced groups)
# ---------------------------------------------------------------------------
_AF_QF = G.fnum(float(ops_stats.ENTROPY_Q))
_AF_SQL = f"""
    WITH per AS MATERIALIZED (
      SELECT user_id % 13 AS g, CAST(count(*) AS BIGINT) AS n_i,
             CAST(sum(event_id % 29 + user_id % 13) AS BIGINT)
               AS s_i,
             CAST(sum((event_id % 29 + user_id % 13)
                  * (event_id % 29 + user_id % 13)) AS BIGINT)
               AS ss_i
      FROM events GROUP BY 1
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS g,
             CAST(sum(n_i) AS BIGINT) AS n_tot,
             CAST(sum(s_i) AS BIGINT) AS st,
             CAST(sum(ss_i) AS BIGINT) AS sst,
             CAST(sum((s_i * s_i
                  * CAST({ops_stats.ENTROPY_Q} AS BIGINT)) // n_i)
               AS BIGINT) AS grp_q
      FROM per
    )
    SELECT g, n_tot, grp_q, st, sst,
           case when g >= 2 and n_tot > g
             and (cast(sst as double)
                  - cast(grp_q as double) / {_AF_QF}) > 0 then
             ((cast(grp_q as double) / {_AF_QF}
               - cast(st as double) * cast(st as double)
               / cast(n_tot as double))
              / (cast(g as double) - 1.0e0))
             / ((cast(sst as double)
                 - cast(grp_q as double) / {_AF_QF})
                / (cast(n_tot as double) - cast(g as double))) end
             AS f_stat
    FROM agg
"""


@gate("anova_f", _AF_SQL)
def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 13).alias("g"),
        (F.col("event_id") % 29 + F.col("user_id") % 13).alias("v"),
    )
    return ops_stats.anova_f(ev, group="g", value="v")
