"""Gate registry extension 174 — graph-shape batch: power-law
degree exponent and directed edge reciprocity."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext12 import _EDGES_SQL, _edges
from pdal_spark.operators import graph as ops_graph

_PL_DMIN = 2
_PL_Q = float(ops_graph.PL_Q)
_PL_DM = G.fnum(float(_PL_DMIN) - 0.5)
_PL_SQL = f"""
    WITH {_EDGES_SQL},
    terms AS (
      SELECT CAST(floor(ln(cast(degree as double) / {_PL_DM})
               * {_PL_Q!r}e0 + 0.5e0) AS BIGINT) AS lnq
      FROM deg WHERE degree >= {_PL_DMIN}
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_tail,
             CAST(sum(lnq) AS BIGINT) AS ln_q_sum
      FROM terms
    )
    SELECT n_tail, ln_q_sum,
           CASE WHEN ln_q_sum > 0 THEN 1.0e0
             + cast(n_tail as double)
             / (cast(ln_q_sum as double) / {_PL_Q!r}e0) END
             AS alpha
    FROM agg
"""


@gate("powerlaw_alpha", _PL_SQL)
def q_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.powerlaw_alpha(
        _edges(spark, sf_dir), d_min=_PL_DMIN
    )


# directed fixture: the RAW hashed edge list (direction kept)
_ER_SQL = f"""
    WITH raw AS MATERIALIZED (
      SELECT (event_id % 48) AS u,
             ({G.lehmer2('event_id')} % 48) AS v
      FROM events WHERE event_id % 19 = 0
    ),
    e AS MATERIALIZED (
      SELECT DISTINCT u, v FROM raw WHERE u <> v
    ),
    mutual AS (
      SELECT CAST(count(*) AS BIGINT) AS n_mutual
      FROM e a JOIN e b ON a.u = b.v AND a.v = b.u
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
    SELECT n_edges, n_mutual,
           CASE WHEN n_edges > 0 THEN
             cast(n_mutual as double) / cast(n_edges as double)
             END AS reciprocity
    FROM tot, mutual
"""


@gate("edge_reciprocity", _ER_SQL)
def q_edge_reciprocity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % 19 == 0
    ).select(
        (F.col("event_id") % 48).alias("src"),
        (F.expr(G.lehmer2("event_id")) % 48).alias("dst"),
    )
    return ops_graph.edge_reciprocity(ev)
