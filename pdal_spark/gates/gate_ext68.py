"""Gate registry extension 68 — HMM map-matching (Viterbi decode of
trajectories onto the snap_lines road set, Newson & Krumm 2009).

Oracle: the SAME integer DP replayed in SQL — a forward recursive
CTE marching every trajectory in rank lockstep carrying the k=3
dp vector (the ewma_smooth convention), then a SECOND recursive CTE
walking each trajectory backward through the recomputed
stay-vs-jump decision (backpointers are a pure function of the
forward dp rows, so they need no extra state). Emission ints are
floor(d2 * 2^20 + 0.5) over the shared IEEE-exact squared-segdist
chain; ties break to the first minimal index in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import gate
from pdal_spark.gates.gate_ext27 import _SNAP_LINES
from pdal_spark.operators.transform import MM_EQ, map_match

_MM_MOD = 11   # 1-in-11 events form the trajectories
_MM_KEYS = 25  # user_id % 25 trajectory key
_MM_P = 50 * MM_EQ  # switch penalty: ~7 degrees of snap slack


def _mm_sql() -> str:
    e = [
        f"CAST(floor(({G.polyline_segdist2('lon', 'lat', pts)})"
        f" * {MM_EQ} + 0.5e0) AS BIGINT)"
        for _, pts in _SNAP_LINES
    ]
    argmin = (
        "CASE WHEN f.d0 <= f.d1 AND f.d0 <= f.d2 THEN 0"
        " WHEN f.d1 <= f.d2 THEN 1 ELSE 2 END"
    )
    jmin = f"least(f.d0, f.d1, f.d2) + {_MM_P}"
    return f"""
    WITH RECURSIVE base AS MATERIALIZED (
      SELECT user_id % {_MM_KEYS} AS key, event_id AS ord,
             {e[0]} AS e0, {e[1]} AS e1, {e[2]} AS e2,
             row_number() OVER (
               PARTITION BY user_id % {_MM_KEYS} ORDER BY event_id
             ) AS r
      FROM (
        SELECT event_id, user_id,
               {G.geo_lat('event_id')} AS lat,
               {G.geo_lon('event_id')} AS lon
        FROM events WHERE event_id % {_MM_MOD} = 0
      ) p
    ),
    fwd AS (
      SELECT key, ord, r, e0 AS d0, e1 AS d1, e2 AS d2
      FROM base WHERE r = 1
      UNION ALL
      SELECT b.key, b.ord, b.r,
             b.e0 + least(f.d0, {jmin}) AS d0,
             b.e1 + least(f.d1, {jmin}) AS d1,
             b.e2 + least(f.d2, {jmin}) AS d2
      FROM base b JOIN fwd f ON b.key = f.key AND b.r = f.r + 1
    ),
    lastr AS (SELECT key, max(r) AS rmax FROM base GROUP BY key),
    bt AS (
      SELECT f.key, f.r, f.ord, {argmin} AS j
      FROM fwd f JOIN lastr l ON l.key = f.key AND f.r = l.rmax
      UNION ALL
      SELECT f.key, f.r, f.ord,
             CASE WHEN (CASE bt.j WHEN 0 THEN f.d0
                        WHEN 1 THEN f.d1 ELSE f.d2 END)
                       <= {jmin}
                  THEN bt.j ELSE {argmin} END AS j
      FROM fwd f JOIN bt ON f.key = bt.key AND f.r = bt.r - 1
    )
    SELECT key, ord AS event_id, CAST(j AS INT) AS line_id FROM bt
    """


@gate("map_match", _mm_sql())
def q_map_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.gate import _t
    from pdal_spark.operators import h3 as ops_h3

    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _MM_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id").select(
        (F.col("user_id") % _MM_KEYS).alias("key"),
        "event_id", "lat", "lon",
    )
    return map_match(
        pts, _SNAP_LINES, switch_penalty_q=_MM_P,
        key_col="key", order_col="event_id",
    )

