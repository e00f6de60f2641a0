"""Gate registry extension 91 — spatial-data-mining + trend batch:
colocation pair counts per category pair (brute-force oracle over
the sampled point set) and the Mann-Kendall S statistic with exact
tie-corrected variance numerator per series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext84 import _DTW_KEYS, _DTW_N, _US_PER_H
from pdal_spark.gates.gate_ext86 import _RK_MOD, _RK_Q
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

DK = G.DUCKDB

_CL_R = 8192

_CL_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT event_id AS pid, event_type AS cat,
             CAST(floor(({G.geo_lon('event_id')}) * {_RK_Q})
                  AS BIGINT) AS xq,
             CAST(floor(({G.geo_lat('event_id')}) * {_RK_Q})
                  AS BIGINT) AS yq
      FROM events WHERE event_id % {_RK_MOD} = 0
    ),
    pr AS MATERIALIZED (
      SELECT a.cat AS cat_a, b.cat AS cat_b
      FROM pts a JOIN pts b ON a.pid < b.pid
      WHERE (a.xq - b.xq) * (a.xq - b.xq)
            + (a.yq - b.yq) * (a.yq - b.yq) <= {_CL_R * _CL_R}
    ),
    dirpairs AS (
      SELECT cat_a, cat_b FROM pr
      UNION ALL
      SELECT cat_b, cat_a FROM pr WHERE cat_a <> cat_b
    ),
    counts AS (
      SELECT cat_a, cat_b, count(*) AS n_pairs
      FROM dirpairs GROUP BY cat_a, cat_b
    ),
    totals AS (
      SELECT cat AS cat_a, count(*) AS n_a FROM pts GROUP BY cat
    )
    SELECT counts.cat_a, cat_b, n_pairs, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_pairs AS DOUBLE) / CAST(n_a AS DOUBLE)
             AS pairs_per_point
    FROM counts JOIN totals ON totals.cat_a = counts.cat_a
"""


@gate("colocation_ratio", _CL_SQL)
def q_colocation_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _RK_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id")
    return ops_stats.colocation_ratio(
        pts, category="event_type", id_col="event_id",
        max_d_q=_CL_R, coord_q=_RK_Q,
    )


_MK_SQL = f"""
    WITH counts AS MATERIALIZED (
      SELECT user_id % {_DTW_KEYS} AS k,
             (epoch_us(ts) // {_US_PER_H}) % {_DTW_N} AS h,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT a.k,
             CAST(sum(sign(b.c - a.c)) AS BIGINT) AS s_stat
      FROM counts a JOIN counts b ON b.k = a.k AND a.h < b.h
      GROUP BY a.k
    ),
    nn AS (SELECT k, count(*) AS n FROM counts GROUP BY k),
    ties AS (
      SELECT k, sum(t * (t - 1) * (2 * t + 5)) AS tie_corr FROM (
        SELECT k, c, count(*) AS t FROM counts GROUP BY k, c
      ) g WHERE t > 1 GROUP BY k
    )
    SELECT s.k, s_stat, CAST(nn.n AS BIGINT) AS n,
           CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                - coalesce(tie_corr, 0) AS BIGINT) AS var18
    FROM s JOIN nn ON nn.k = s.k
    LEFT JOIN ties ON ties.k = s.k
"""


@gate("mann_kendall", _MK_SQL)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % _DTW_KEYS).alias("k"),
        ((F.unix_micros(F.col("ts").cast("timestamp"))
          / F.lit(_US_PER_H)).cast("long") % _DTW_N).alias("h"),
    )
    counts = ev.groupBy("k", "h").agg(F.count(F.lit(1)).alias("c"))
    return ops_temporal.mann_kendall(counts, key="k", order="h",
                                     value="c")

