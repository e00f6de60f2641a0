"""Gate registry extension 171 — clustering-agreement batch:
variation of information and cluster purity."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import cluster as ops_cluster

_VI_Q = float(ops_cluster.VI_Q)
_VI_A = "(user_id % 6)"
_VI_B = f"(CAST(({G.lehmer2('user_id')} % 10) AS BIGINT))"
_VI_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_VI_A} AS a, {_VI_B} AS b FROM events
    ),
    nij AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY a, b
    ),
    na AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca
           FROM nij GROUP BY a),
    nb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb
           FROM nij GROUP BY b),
    n_t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM nij),
    terms AS (
      SELECT c, n,
             CAST(floor(ln(cast(ca as double) * cast(cb as double)
               / (cast(c as double) * cast(c as double)))
               * {_VI_Q!r}e0 + 0.5e0) AS BIGINT) AS lnq
      FROM nij JOIN na USING (a) JOIN nb USING (b), n_t
    ),
    agg AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(sum(c * lnq) AS BIGINT) AS vi_q_sum
      FROM terms
    )
    SELECT n, vi_q_sum,
           CASE WHEN n > 0 THEN cast(vi_q_sum as double)
             / (cast(n as double) * {_VI_Q!r}e0) END AS vi
    FROM agg
"""


@gate("variation_information", _VI_SQL)
def q_variation_information(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_VI_A).alias("a"), F.expr(_VI_B).alias("b")
    )
    return ops_cluster.variation_information(
        ev, label_a="a", label_b="b"
    )


_CP_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_VI_B} AS c, event_type AS t FROM events
    ),
    nct AS (
      SELECT c, t, CAST(count(*) AS BIGINT) AS m
      FROM s GROUP BY c, t
    ),
    per_c AS (
      SELECT c, CAST(max(m) AS BIGINT) AS mx,
             CAST(sum(m) AS BIGINT) AS sz
      FROM nct GROUP BY c
    )
    SELECT CAST(sum(sz) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(mx) AS BIGINT) AS sum_majority,
           CASE WHEN sum(sz) > 0 THEN
             cast(sum(mx) as double) / cast(sum(sz) as double) END
             AS purity
    FROM per_c
"""


@gate("cluster_purity", _CP_SQL)
def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_VI_B).alias("c"), F.col("event_type").alias("t")
    )
    return ops_cluster.cluster_purity(ev, cluster="c", truth="t")
