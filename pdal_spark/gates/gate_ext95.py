"""Gate registry extension 95 — spatial co-visitation: Jaccard of
visited-cell sets between user pairs sharing a block."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3

_CJ_RES = 5
_CJ_BLOCKS = 12

_CJ_SQL = f"""
    WITH enc AS MATERIALIZED (
      SELECT DISTINCT user_id AS k, user_id % {_CJ_BLOCKS} AS b,
             {G.qcell(G.geo_lat('event_id'), G.geo_lon('event_id'),
                      _CJ_RES)} AS cell
      FROM events
    ),
    sizes AS (SELECT k, count(*) AS n FROM enc GROUP BY k),
    inter AS (
      SELECT x.k, y.k AS k2, count(*) AS n_inter
      FROM enc x JOIN enc y
        ON y.b = x.b AND y.cell = x.cell AND x.k < y.k
      GROUP BY x.k, y.k
    )
    SELECT inter.k AS key_a, inter.k2 AS key_b, n_inter,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(n_inter AS DOUBLE)
             / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.k = inter.k
    JOIN sizes sb ON sb.k = inter.k2
"""


@gate("cell_jaccard_pairs", _CJ_SQL)
def q_cell_jaccard_pairs(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_h3.cell_jaccard_pairs(
        pts.select("user_id",
                   (F.col("user_id") % _CJ_BLOCKS).alias("blk"),
                   "lat", "lon"),
        key="user_id", block="blk", res=_CJ_RES,
    )
