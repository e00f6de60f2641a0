"""Gate registry extension 80 — Luby's maximal independent set
(deterministic hash priorities) on the 512-node link-graph fixture:
the conflict-free parallel-scheduling primitive. Oracle unrolls the
identical rounds — winners beat every undecided neighbor in the
(mix_hash * 2^31 + node) total order, then knock their undecided
neighbors out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark import sqlgen as G
from pdal_spark.gate import gate
from pdal_spark.gates.gate_ext67 import _HB_M, _HB_N, _hb_edges
from pdal_spark.operators import graph as ops_graph

_MIS_ROUNDS = 8


def _mis_sql(rounds: int) -> str:
    k = f"({G.mix_hash('node')} * {1 << 31} + node)"
    parts = [f"""
    WITH raw AS MATERIALIZED (
      SELECT (event_id % {_HB_N}) AS a,
             ({G.lehmer2('event_id')} % {_HB_N}) AS b
      FROM events WHERE event_id % {_HB_M} = 0
    ),
    e AS MATERIALIZED (
      SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi
      FROM raw WHERE a <> b
    ),
    adj AS MATERIALIZED (
      SELECT lo AS node, hi AS nb FROM e
      UNION ALL SELECT hi, lo FROM e
    ),
    u0 AS MATERIALIZED (
      SELECT node, {k} AS k FROM (
        SELECT DISTINCT node FROM adj
      ) n
    )"""]
    for t in range(1, rounds + 1):
        parts.append(f""",
    w{t} AS MATERIALIZED (
      SELECT u.node FROM u{t - 1} u
      LEFT JOIN (
        SELECT adj.node, max(n.k) AS mx
        FROM adj JOIN u{t - 1} n ON n.node = adj.nb
        GROUP BY 1
      ) m ON m.node = u.node
      WHERE m.mx IS NULL OR u.k > m.mx
    ),
    o{t} AS MATERIALIZED (
      SELECT DISTINCT adj.node
      FROM adj
      JOIN w{t} w ON w.node = adj.nb
      JOIN u{t - 1} u ON u.node = adj.node
    ),
    u{t} AS MATERIALIZED (
      SELECT u.node, u.k FROM u{t - 1} u
      LEFT JOIN w{t} w ON w.node = u.node
      LEFT JOIN o{t} o ON o.node = u.node
      WHERE w.node IS NULL AND o.node IS NULL
    )""")
    sel = "\n      UNION ALL ".join(
        f"SELECT node, TRUE AS mis, CAST({t} AS INT) AS round"
        f" FROM w{t}"
        f"\n      UNION ALL SELECT node, FALSE, CAST({t} AS INT)"
        f" FROM o{t}"
        for t in range(1, rounds + 1)
    )
    parts.append(f"""
    {sel}
    """)
    return "".join(parts)


@gate("luby_mis", _mis_sql(_MIS_ROUNDS))
def q_luby_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.luby_mis(
        _hb_edges(spark, sf_dir), rounds=_MIS_ROUNDS
    )

