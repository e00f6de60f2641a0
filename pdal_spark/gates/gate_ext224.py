"""Gate registry extension 224 — graph-evolution batch: edge churn
and degree summary."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext12 import _EDGES_SQL, _edges
from pdal_spark.operators import graph as ops_graph

_EC_GN = 48


def _snap_sql(mod: int, name: str) -> str:
    return f"""
    {name}_raw AS MATERIALIZED (
      SELECT (event_id % {_EC_GN}) AS src,
             ({G.lehmer2('event_id')} % {_EC_GN}) AS dst
      FROM events WHERE event_id % {mod} = 0
    ),
    {name} AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS lo,
             greatest(src, dst) AS hi
      FROM {name}_raw WHERE src <> dst
    )"""


_EC_SQL = f"""
    WITH {_snap_sql(19, 'ea')},
    {_snap_sql(23, 'eb')},
    common AS (
      SELECT CAST(count(*) AS BIGINT) AS n_common
      FROM ea JOIN eb ON ea.lo = eb.lo AND ea.hi = eb.hi
    ),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM ea),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM eb)
    SELECT n_a, n_b, n_common,
           CAST(n_b - n_common AS BIGINT) AS n_added,
           CAST(n_a - n_common AS BIGINT) AS n_removed,
           CASE WHEN n_a + n_b - n_common > 0 THEN
             cast(n_common as double)
             / cast(n_a + n_b - n_common as double) END
             AS jaccard
    FROM na, nb, common
"""


def _snap_df(spark, sf_dir, mod):
    ev = _t(spark, sf_dir, "events")
    return ev.where(F.col("event_id") % mod == 0).select(
        (F.col("event_id") % _EC_GN).alias("src"),
        (F.expr(G.lehmer2("event_id")) % _EC_GN).alias("dst"),
    )


@gate("edge_churn", _EC_SQL)
def q_edge_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.edge_churn(
        _snap_df(spark, sf_dir, 19), _snap_df(spark, sf_dir, 23)
    )


_DS_SQL = f"""
    WITH {_EDGES_SQL},
    ranked AS (
      SELECT degree,
             CAST(row_number() OVER (ORDER BY degree ASC,
               node ASC) AS BIGINT) AS i,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM deg
    ),
    agg AS (
      SELECT CAST(max(n) AS BIGINT) AS n_nodes,
             CAST(sum(degree) AS BIGINT) AS deg_sum,
             CAST(max(degree) AS BIGINT) AS max_degree,
             CAST(sum((2 * i - n - 1) * degree) AS BIGINT)
               AS g_num
      FROM ranked
    ),
    ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
    SELECT n_nodes, n_edges, max_degree,
           cast(deg_sum as double) / cast(n_nodes as double)
             AS mean_degree,
           CASE WHEN deg_sum > 0 THEN cast(g_num as double)
             / (cast(n_nodes as double)
             * cast(deg_sum as double)) END AS degree_gini
    FROM agg, ne
"""


@gate("degree_summary", _DS_SQL)
def q_degree_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.degree_summary(_edges(spark, sf_dir))
