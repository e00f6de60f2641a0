"""Gate registry extension 70 — source-sampled betweenness
centrality (Brandes 2001 / Brandes & Pich 2007 pivots) on the
512-node hyperball fixture.

Oracle: both passes unrolled — forward BFS levels with path-count
sigma (anti-join via LEFT JOIN IS NULL), backward dependency
accumulation with the SAME per-term fixed-point quantization
(sigma_v * (Q + delta_w)) // sigma_w, so every compared value is an
exact integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark.gate import gate
from pdal_spark.gates.gate_ext67 import _HB_M, _HB_N, _hb_edges
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators.graph import BC_Q

_BC_SOURCES = [3, 17, 64, 129, 200, 311, 404, 487]
_BC_DEPTH = 4


def _bc_sql(depth: int) -> str:
    from pdal_spark import sqlgen as G

    srcs = ", ".join(f"({s})" for s in _BC_SOURCES)
    parts = [f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT (event_id % {_HB_N}) AS a,
             ({G.lehmer2('event_id')} % {_HB_N}) AS b
      FROM events WHERE event_id % {_HB_M} = 0
        AND (event_id % {_HB_N})
            <> ({G.lehmer2('event_id')} % {_HB_N})
    ),
    f0 AS MATERIALIZED (
      SELECT CAST(s.s AS BIGINT) AS src, CAST(s.s AS BIGINT) AS node,
             CAST(1 AS BIGINT) AS sigma
      FROM (VALUES {srcs}) s(s)
    ),
    vis0 AS MATERIALIZED (
      SELECT src, node, sigma, 0 AS level FROM f0
    )"""]
    for t in range(1, depth + 1):
        parts.append(f""",
    f{t} AS MATERIALIZED (
      SELECT f.src, e.b AS node, CAST(sum(f.sigma) AS BIGINT) AS sigma
      FROM f{t - 1} f
      JOIN e ON e.a = f.node
      LEFT JOIN vis{t - 1} v ON v.src = f.src AND v.node = e.b
      WHERE v.node IS NULL
      GROUP BY 1, 2
    ),
    vis{t} AS MATERIALIZED (
      SELECT src, node, sigma, level FROM vis{t - 1}
      UNION ALL
      SELECT src, node, sigma, {t} AS level FROM f{t}
    )""")
    parts.append(f""",
    d{depth} AS MATERIALIZED (
      SELECT src, node, sigma, CAST(0 AS BIGINT) AS delta
      FROM vis{depth} WHERE level = {depth}
    )""")
    for t in range(depth, 0, -1):
        parts.append(f""",
    d{t - 1} AS MATERIALIZED (
      SELECT v.src, v.node, v.sigma,
             CAST(coalesce(sum(
               (v.sigma * ({BC_Q} + w.delta)) // w.sigma
             ), 0) AS BIGINT) AS delta
      FROM (SELECT src, node, sigma FROM vis{depth}
            WHERE level = {t - 1}) v
      LEFT JOIN e ON e.a = v.node
      LEFT JOIN d{t} w ON w.src = v.src AND w.node = e.b
      GROUP BY 1, 2, 3
    )""")
    union = "\n      UNION ALL ".join(
        f"SELECT src, node, delta FROM d{t}"
        for t in range(depth, -1, -1)
    )
    parts.append(f"""
    SELECT node, CAST(sum(delta) AS BIGINT) AS bc_q
    FROM ({union}) u
    WHERE node <> src
    GROUP BY node
    """)
    return "".join(parts)


@gate("betweenness", _bc_sql(_BC_DEPTH))
def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.betweenness_sampled(
        _hb_edges(spark, sf_dir),
        sources=_BC_SOURCES, max_depth=_BC_DEPTH, directed=True,
    )

