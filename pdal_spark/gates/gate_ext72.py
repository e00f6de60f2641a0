"""Gate registry extension 72 — weighted multi-source shortest
paths (fixed-round Bellman-Ford) on the 512-node fixture with
deterministic per-edge integer weights w = 1 + (a*31 + b) % 9.

Oracle: the same relaxations unrolled FULLY (every node re-relaxed
each round) — the frontier-driven Spark loop computes identical
distances because contributions of unimproved nodes were already
min-folded in earlier rounds (monotone relaxation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import gate
from pdal_spark.gates.gate_ext67 import _HB_M, _HB_N, _hb_edges
from pdal_spark.operators import graph as ops_graph

_SP_SOURCES = [3, 64, 200, 404]
# weighted shortest paths need rounds >= max HOP COUNT of any
# shortest path (13 on the sf0.01 fixture by driver-side Dijkstra;
# the fixpoint pytest proves the budget suffices)
_SP_ROUNDS = 15


def _sssp_sql(rounds: int) -> str:
    srcs = ", ".join(f"({s})" for s in _SP_SOURCES)
    parts = [f"""
    WITH e AS MATERIALIZED (
      SELECT a, b, min(w) AS w FROM (
        SELECT (event_id % {_HB_N}) AS a,
               ({G.lehmer2('event_id')} % {_HB_N}) AS b,
               1 + ((event_id % {_HB_N}) * 31
                    + ({G.lehmer2('event_id')} % {_HB_N})) % 9 AS w
        FROM events WHERE event_id % {_HB_M} = 0
      ) r WHERE a <> b GROUP BY 1, 2
    ),
    d0 AS MATERIALIZED (
      SELECT CAST(s.s AS BIGINT) AS seed, CAST(s.s AS BIGINT) AS node,
             CAST(0 AS BIGINT) AS dist
      FROM (VALUES {srcs}) s(s)
    )"""]
    for t in range(1, rounds + 1):
        parts.append(f""",
    d{t} AS MATERIALIZED (
      SELECT seed, node, CAST(min(dist) AS BIGINT) AS dist FROM (
        SELECT seed, node, dist FROM d{t - 1}
        UNION ALL
        SELECT d.seed, e.b AS node, d.dist + e.w AS dist
        FROM d{t - 1} d JOIN e ON e.a = d.node
      ) u GROUP BY 1, 2
    )""")
    parts.append(f"""
    SELECT seed, node, dist FROM d{rounds}
    """)
    return "".join(parts)


def _sp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _hb_edges(spark, sf_dir)
    return raw.select(
        "src", "dst",
        (1 + (F.col("src") * 31 + F.col("dst")) % 9).alias("w"),
    )


@gate("weighted_sssp", _sssp_sql(_SP_ROUNDS))
def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.weighted_sssp(
        _sp_edges(spark, sf_dir),
        sources=_SP_SOURCES, rounds=_SP_ROUNDS, weight="w",
    )

