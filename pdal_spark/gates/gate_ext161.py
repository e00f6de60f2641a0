"""Gate registry extension 161 — facility-location batch: greedy
p-median with an unrolled-round oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import knn as ops_knn

_PM_K = 4
_PM_BIG = ops_knn.PMED_BIG
_PM_DEM = "event_id % 43 = 0"
_PM_CAND = "event_id % 311 = 7"
_PM_X = f"CAST({G.lehmer2('event_id')} % 1000 AS BIGINT)"
_PM_Y = f"CAST({G.lehmer2('event_id * 7 + 2')} % 1000 AS BIGINT)"
_PM_W = "(1 + user_id % 5)"


def _pm_sql(k: int) -> str:
    parts = [f"""
    WITH dem AS MATERIALIZED (
      SELECT event_id AS d, {_PM_X} AS dx, {_PM_Y} AS dy,
             CAST({_PM_W} AS BIGINT) AS w
      FROM events WHERE {_PM_DEM}
    ),
    cand AS MATERIALIZED (
      SELECT event_id AS f, {_PM_X} AS fx, {_PM_Y} AS fy
      FROM events WHERE {_PM_CAND}
    ),
    dist AS MATERIALIZED (
      SELECT d, w, f,
             (dx - fx) * (dx - fx) + (dy - fy) * (dy - fy) AS d2
      FROM dem CROSS JOIN cand
    ),
    cur0 AS MATERIALIZED (
      SELECT d, w, CAST({_PM_BIG} AS BIGINT) AS cur FROM dem
    )"""]
    for i in range(1, k + 1):
        prev_picks = " UNION ALL ".join(
            f"SELECT f FROM p{j}" for j in range(1, i)
        )
        excl = (
            f"ANTI JOIN ({prev_picks}) px ON dist.f = px.f"
            if prev_picks else ""
        )
        parts.append(f""",
    p{i} AS MATERIALIZED (
      SELECT dist.f, CAST(sum(dist.w * least(cur{i - 1}.cur,
               dist.d2)) AS BIGINT) AS cost
      FROM dist {excl}
      JOIN cur{i - 1} ON dist.d = cur{i - 1}.d
      GROUP BY dist.f
      ORDER BY cost ASC, dist.f ASC LIMIT 1
    ),
    cur{i} AS MATERIALIZED (
      SELECT c.d, c.w,
             CAST(least(c.cur, coalesce(u.nd,
               CAST({_PM_BIG} AS BIGINT))) AS BIGINT) AS cur
      FROM cur{i - 1} c LEFT JOIN (
        SELECT dist.d, dist.d2 AS nd FROM dist, p{i}
        WHERE dist.f = p{i}.f
      ) u ON c.d = u.d
    )""")
    sels = [
        f"SELECT CAST(f AS BIGINT) AS fid,"
        f" CAST({i} AS BIGINT) AS sel_rank, cost FROM p{i}"
        for i in range(1, k + 1)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(sels))
    return "".join(parts)


@gate("p_median_greedy", _pm_sql(_PM_K))
def q_p_median_greedy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    x = f"cast({G.lehmer2('event_id')} % 1000 as bigint)"
    y = f"cast({G.lehmer2('event_id * 7 + 2')} % 1000 as bigint)"
    dem = _t(spark, sf_dir, "events").where(_PM_DEM).select(
        F.col("event_id").alias("did"),
        F.expr(x).alias("x"), F.expr(y).alias("y"),
        F.expr(_PM_W).cast("long").alias("w"),
    )
    cand = _t(spark, sf_dir, "events").where(_PM_CAND).select(
        F.col("event_id").alias("fid"),
        F.expr(x).alias("x"), F.expr(y).alias("y"),
    )
    return ops_knn.p_median_greedy(dem, cand, k=_PM_K)
