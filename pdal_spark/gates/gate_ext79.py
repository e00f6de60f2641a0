"""Gate registry extension 79 — drift magnitude + community
bottleneck: exact 1-d Wasserstein distance between the two A/B
arms' quantized value distributions (the transport-mass companion
to ks_test's worst-gap), and per-community conductance of the LPA
partition (the leak score modularity misses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext12 import _EDGES_SQL, _edges
from pdal_spark.gates.gate_ext13 import _LPA_ROUNDS, _lpa_sql
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators.stats import wasserstein_1d

_W1_Q = 1 << 8  # value quantizer (gap * n_a * n_b must fit int64)
_W1_V = f"CAST(floor(value * {_W1_Q} + 0.5e0) AS BIGINT)"


def _w1_sql() -> str:
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT {_W1_V} AS v,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS ia,
             CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END AS ib
      FROM events
    ),
    per AS MATERIALIZED (
      SELECT v, CAST(sum(ia) AS BIGINT) AS ca,
             CAST(sum(ib) AS BIGINT) AS cb
      FROM pts GROUP BY 1
    ),
    c AS (
      SELECT v,
             sum(ca) OVER (ORDER BY v ASC
               ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS fa,
             sum(cb) OVER (ORDER BY v ASC
               ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS fb,
             sum(ca) OVER () AS na,
             sum(cb) OVER () AS nb,
             lead(v) OVER (ORDER BY v ASC) AS nx
      FROM per
    )
    SELECT CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b,
           CAST(sum(CASE WHEN nx IS NOT NULL THEN
             (nx - v) * abs(fa * nb - fb * na)
             ELSE 0 END) AS BIGINT) AS w1_num,
           CAST(sum(CASE WHEN nx IS NOT NULL THEN
             (nx - v) * abs(fa * nb - fb * na)
             ELSE 0 END) AS DOUBLE)
             / CAST(max(na) * max(nb) AS DOUBLE) AS w1
    FROM c
    """


@gate("wasserstein_1d", _w1_sql())
def q_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("arm"),
        F.expr(_W1_V).alias("v"),
    )
    return wasserstein_1d(
        ev.where("arm = 0"), ev.where("arm = 1"), "v"
    )


def _cond_sql() -> str:
    lpa = _lpa_sql(_LPA_ROUNDS)
    return f"""
    WITH assign AS MATERIALIZED (
      SELECT node, community AS c FROM ({lpa}) lp
    ),
    {_EDGES_SQL},
    mm AS (SELECT count(*) AS m FROM e),
    vol AS (
      SELECT a.c, count(*) AS n_nodes,
             CAST(sum(deg.degree) AS BIGINT) AS vol
      FROM deg JOIN assign a USING (node)
      GROUP BY 1
    ),
    tagged AS (
      SELECT al.c AS c_lo, ah.c AS c_hi
      FROM e
      JOIN assign al ON al.node = e.lo
      JOIN assign ah ON ah.node = e.hi
      WHERE al.c <> ah.c
    ),
    cut AS (
      SELECT c, count(*) AS cut FROM (
        SELECT c_lo AS c FROM tagged
        UNION ALL SELECT c_hi FROM tagged
      ) u GROUP BY 1
    )
    SELECT vol.c AS community, vol.n_nodes, vol.vol,
           CAST(coalesce(cut.cut, 0) AS BIGINT) AS cut, mm.m,
           CASE WHEN least(vol.vol, 2 * mm.m - vol.vol) > 0 THEN
             CAST(coalesce(cut.cut, 0) AS DOUBLE)
               / CAST(least(vol.vol, 2 * mm.m - vol.vol) AS DOUBLE)
           END AS phi
    FROM vol LEFT JOIN cut ON cut.c = vol.c
    CROSS JOIN mm
    """


@gate("conductance", _cond_sql())
def q_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    assign = ops_graph.label_propagation(e, rounds=_LPA_ROUNDS)
    return ops_graph.conductance(e, assign)

