"""Gate registry extension 154 — walk/privacy batch: random-walk
entropy rate, l-diversity audit, t-closeness EMD."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext12 import _EDGES_SQL, _edges
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import textops as ops_text

# ---------------------------------------------------------------------------
# random_walk_entropy — closed-form RW entropy over the shared graph
# ---------------------------------------------------------------------------
_RW_Q = float(ops_graph.RWE_Q)
_RW_SQL = f"""
    WITH {_EDGES_SQL},
    terms AS (
      SELECT degree,
             CAST(floor(ln(cast(degree as double))
               * {_RW_Q!r}e0 + 0.5e0) AS BIGINT) AS lnq
      FROM deg
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(degree) AS BIGINT) AS two_m,
             CAST(sum(degree * lnq) AS BIGINT) AS h_q_sum
      FROM terms
    )
    SELECT n_nodes, two_m, h_q_sum,
           CASE WHEN two_m > 0 THEN cast(h_q_sum as double)
             / (cast(two_m as double) * {_RW_Q!r}e0) END AS h
    FROM agg
"""


@gate("random_walk_entropy", _RW_SQL)
def q_random_walk_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return ops_graph.random_walk_entropy(_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# l_diversity — (user bucket, type) quasi groups, value-bucket
# sensitive attribute
# ---------------------------------------------------------------------------
_LD_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 50 AS qa, event_type AS qb,
             CAST(floor(value / 100) AS BIGINT) AS sv
      FROM events
    ),
    per AS (
      SELECT qa, qb, sv, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY qa, qb, sv
    )
    SELECT qa, qb, CAST(sum(c) AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS l,
           CAST(max(c) AS BIGINT) AS top_count
    FROM per GROUP BY qa, qb
"""


@gate("l_diversity", _LD_SQL)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 50).alias("qa"),
        F.col("event_type").alias("qb"),
        F.expr("cast(floor(value / 100) as bigint)").alias("sv"),
    )
    return ops_text.l_diversity(
        ev, quasi_cols=["qa", "qb"], sensitive="sv"
    )


# ---------------------------------------------------------------------------
# t_closeness — user-bucket groups vs the global value ladder
# ---------------------------------------------------------------------------
_TC_Q = ops_text.TCL_Q
_TC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 25 AS g,
             CAST(floor(value / 50) AS BIGINT) AS v
      FROM events
    ),
    cnt_gv AS (
      SELECT g, v, CAST(count(*) AS BIGINT) AS c_gv
      FROM s GROUP BY g, v
    ),
    cnt_v AS (
      SELECT v, CAST(count(*) AS BIGINT) AS c_v
      FROM s GROUP BY v
    ),
    n_all AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
    n_g AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g FROM s GROUP BY g
    ),
    lattice AS (
      SELECT n_g.g, n_g.n_g, cnt_v.v,
             coalesce(cnt_gv.c_gv, 0) AS c_gv
      FROM n_g CROSS JOIN cnt_v
      LEFT JOIN cnt_gv ON cnt_gv.g = n_g.g
        AND cnt_gv.v = cnt_v.v
    ),
    cum_v AS (
      SELECT v,
             CAST(sum(c_v) OVER (ORDER BY v ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_v,
             CAST(count(*) OVER () AS BIGINT) AS n_vals
      FROM cnt_v
    ),
    cum AS (
      SELECT lattice.g, lattice.n_g,
             CAST(sum(lattice.c_gv) OVER (PARTITION BY lattice.g
               ORDER BY lattice.v ASC ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cum_gv,
             cum_v.cum_v, cum_v.n_vals, n_all.n
      FROM lattice JOIN cum_v ON lattice.v = cum_v.v, n_all
    ),
    per_g AS (
      SELECT g, CAST(max(n_g) AS BIGINT) AS n_g,
             CAST(max(n_vals) AS BIGINT) AS n_vals,
             CAST(max(n) AS BIGINT) AS n,
             CAST(sum(abs(cum_gv * n - cum_v * n_g)) AS BIGINT)
               AS emd_num
      FROM cum GROUP BY g
    )
    SELECT g, n_g,
           CAST(CASE WHEN n_vals > 1 THEN
             (emd_num * CAST({_TC_Q} AS BIGINT))
             // (n_g * n * (n_vals - 1))
             ELSE 0 END AS BIGINT) AS emd_q,
           CASE WHEN n_vals > 1 THEN cast(emd_num as double)
             / (cast(n_g as double) * cast(n as double)
             * (cast(n_vals as double) - 1.0e0)) END AS emd
    FROM per_g
"""


@gate("t_closeness", _TC_SQL)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 25).alias("g"),
        F.expr("cast(floor(value / 50) as bigint)").alias("v"),
    )
    return ops_text.t_closeness(
        ev, quasi_cols=["g"], sensitive="v"
    )
