"""Gate registry extension 67 — sketch-powered graph analytics at
scale: HyperBall neighborhood function (per-node HLL registers
iterated along the reversed adjacency — Boldi & Vigna 2013, the
closeness/harmonic path that works when all-pairs BFS cannot).

Oracle: the identical register algebra unrolled round by round —
init registers from mix_hash, per-round (node, bucket) MAX over own
plus out-neighbor registers, per-round integer moments + the shared
hll_est_sql() estimate. Every compared integer is exact; the one ln
in ball_est is rounded 4dp on both sides (the hll_distinct
convention).

Fixture: a 512-node directed link graph from events (1-in-5), dense
enough at sf0.01 (out-degree ~4) that depth-3 balls grow well past
the linear-counting regime without saturating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import sketch as SK

_HB_N = 512  # node space
_HB_M = 5    # 1-in-5 events contribute an edge
_HB_DEPTH = 3


def _hb_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.where(F.col("event_id") % _HB_M == 0).select(
        (F.col("event_id") % _HB_N).alias("src"),
        (F.expr(G.lehmer2("event_id")) % _HB_N).alias("dst"),
    )


def _hyperball_sql(depth: int) -> str:
    h = G.mix_hash("node")
    # DuckDB floor-div; operands non-negative so it matches Spark div
    rho0 = SK.hll_rho_sql(f"(({h}) // {SK.HLL_M})")
    est = SK.hll_est_sql()
    moments = f"""
      SELECT node, count(*) AS n_used,
             CAST(sum((CAST(1 AS BIGINT) << ({SK._RHO_K} - rho)))
                  + (CAST({SK.HLL_M} AS BIGINT) - count(*))
                    * (CAST(1 AS BIGINT) << {SK._RHO_K})
                  AS BIGINT) AS sum_q
    """
    parts = [f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT (event_id % {_HB_N}) AS a,
             ({G.lehmer2('event_id')} % {_HB_N}) AS b
      FROM events WHERE event_id % {_HB_M} = 0
        AND (event_id % {_HB_N})
            <> ({G.lehmer2('event_id')} % {_HB_N})
    ),
    nodes AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT a AS node FROM e UNION ALL SELECT b FROM e
      ) u
    ),
    r0 AS MATERIALIZED (
      SELECT node, ({h}) % {SK.HLL_M} AS bkt, {rho0} AS rho
      FROM nodes
    ),
    m0 AS ({moments} FROM r0 GROUP BY node)"""]
    for t in range(1, depth + 1):
        parts.append(f""",
    r{t} AS MATERIALIZED (
      SELECT node, bkt, max(rho) AS rho FROM (
        SELECT node, bkt, rho FROM r{t - 1}
        UNION ALL
        SELECT e.a AS node, r.bkt, r.rho
        FROM e JOIN r{t - 1} r ON r.node = e.b
      ) u GROUP BY 1, 2
    ),
    m{t} AS ({moments} FROM r{t} GROUP BY node)""")
    sel = "\n    UNION ALL ".join(
        f"SELECT node, CAST({t} AS INT) AS t, n_used, sum_q, {est}"
        f" AS ball_est FROM m{t}"
        for t in range(depth + 1)
    )
    parts.append(f"\n    {sel}\n")
    return "".join(parts)


@gate("hyperball", _hyperball_sql(_HB_DEPTH))
def q_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.hyperball(
        _hb_edges(spark, sf_dir), max_depth=_HB_DEPTH, directed=True
    )

