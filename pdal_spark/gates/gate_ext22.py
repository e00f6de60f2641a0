"""Gate registry extension 22 — geodesic & robust-estimation batch:
geodesic radius join (haversine "within R meters", cos-widened cell
rings; oracle = brute-force pair scan), per-group geometric median
(Weiszfeld in shifted-integer form, unrolled-iteration oracle), and
per-group Theil-Sen robust slope (median of pairwise IEEE slopes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import cluster as ops_cluster
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import knn as ops_knn
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal  # noqa: F401

# ---------------------------------------------------------------------------
# radius_geodesic — exactness is the final quantized haversine, so
# the oracle needs NO cells: a brute-force pair scan must hash-match,
# proving the widened candidate rings lossless.
# ---------------------------------------------------------------------------

_RG_MOD = 7
_RG_RADIUS_M = 1_000_000.0  # 1000 km

_RG_PTS = f"""
    (SELECT event_id, {G.geo_lat('event_id')} AS lat,
            {G.geo_lon('event_id')} AS lon
     FROM events WHERE event_id % {_RG_MOD} = 0)
"""

_RG_HAV = G.haversine_m("a.lat", "a.lon", "b.lat", "b.lon")

_RG_SQL = f"""
    WITH sub AS MATERIALIZED (SELECT * FROM {_RG_PTS} s)
    SELECT a.event_id AS src_id, b.event_id AS nb_id,
           CAST(floor({_RG_HAV} * {G.fnum(1000.0)} + {G.fnum(0.5)})
             AS BIGINT) AS dist_mm
    FROM sub a JOIN sub b ON a.event_id <> b.event_id
    WHERE CAST(floor({_RG_HAV} * {G.fnum(1000.0)} + {G.fnum(0.5)})
          AS BIGINT) <= {int(round(_RG_RADIUS_M * 1000))}
"""


@gate("radius_geodesic", _RG_SQL)
def q_radius_geodesic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _RG_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id")
    return ops_knn.radius_join_geodesic(
        pts, pts, _RG_RADIUS_M, id_left="event_id",
        id_right="event_id", include_self=False,
    )


# ---------------------------------------------------------------------------
# geometric_median — unrolled Weiszfeld iterations on the shifted
# non-negative integer grid (div == // only without signs).
# ---------------------------------------------------------------------------

_GM_ITERS = 3


def _gm_sql(iters: int) -> str:
    q = ops_cluster.GM_COORD_Q
    qf = G.fnum(float(q))
    wq = G.fnum(float(ops_cluster.GM_W_Q))
    cap = ops_cluster.GM_W_CAP
    d = (
        f"sqrt((CAST(p.xq - s.cx_q AS DOUBLE) / {qf})"
        f" * (CAST(p.xq - s.cx_q AS DOUBLE) / {qf})"
        f" + (CAST(p.yq - s.cy_q AS DOUBLE) / {qf})"
        f" * (CAST(p.yq - s.cy_q AS DOUBLE) / {qf}))"
    )
    w = (
        f"CASE WHEN {d} = 0.0e0 THEN CAST(0 AS BIGINT)"
        f" ELSE least(CAST({cap} AS BIGINT),"
        f" CAST(floor({wq} / {d}) AS BIGINT)) END"
    )
    parts = [f"""
    WITH pts AS MATERIALIZED (
      SELECT user_id AS k,
             CAST(floor(({G.geo_lon('event_id')} + 180.0e0) * {q})
               AS BIGINT) AS xq,
             CAST(floor(({G.geo_lat('event_id')} + 90.0e0) * {q})
               AS BIGINT) AS yq
      FROM events
    ),
    s0 AS MATERIALIZED (
      SELECT k, sum(xq) // count(*) AS cx_q,
             sum(yq) // count(*) AS cy_q
      FROM pts GROUP BY k
    )"""]
    prev = "s0"
    for i in range(1, iters + 1):
        parts.append(f""",
    s{i} AS MATERIALIZED (
      SELECT k,
             CASE WHEN ws > 0 THEN wx // ws ELSE pcx END AS cx_q,
             CASE WHEN ws > 0 THEN wy // ws ELSE pcy END AS cy_q
      FROM (
        SELECT p.k, sum({w}) AS ws,
               sum(({w}) * p.xq) AS wx,
               sum(({w}) * p.yq) AS wy,
               max(s.cx_q) AS pcx, max(s.cy_q) AS pcy
        FROM pts p JOIN {prev} s ON s.k = p.k
        GROUP BY p.k
      ) t
    )""")
        prev = f"s{i}"
    parts.append(f"""
    SELECT k AS user_id, cx_q, cy_q,
           CAST(cx_q AS DOUBLE) / {qf} - 180.0e0 AS gx,
           CAST(cy_q AS DOUBLE) / {qf} - 90.0e0 AS gy
    FROM {prev}
    """)
    return "".join(parts)


@gate("geometric_median", _gm_sql(_GM_ITERS))
def q_geometric_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_cluster.geometric_median(
        pts, key_col="user_id", x="lon", y="lat", iters=_GM_ITERS
    )


# ---------------------------------------------------------------------------
# theil_sen — lower-median pairwise slope per key.
# ---------------------------------------------------------------------------

_TS_SQL = """
    WITH pts AS MATERIALIZED (
      SELECT user_id AS k, epoch_us(ts) AS x,
             CAST(value AS DOUBLE) AS y,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ) AS i
      FROM events
    ),
    pairs AS MATERIALIZED (
      SELECT a.k, a.i AS i, b.i AS j,
             (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS s
      FROM pts a JOIN pts b ON b.k = a.k AND b.i > a.i
      WHERE b.x <> a.x
    ),
    ranked AS (
      SELECT k, s,
             row_number() OVER (
               PARTITION BY k ORDER BY s ASC, i ASC, j ASC
             ) AS rn,
             count(*) OVER (PARTITION BY k) AS n
      FROM pairs
    )
    SELECT k AS user_id, n AS n_pairs, s AS slope
    FROM ranked WHERE rn = (n + 1) // 2
"""


@gate("theil_sen", _TS_SQL)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_stats.theil_sen(ev)

