"""Gate registry extension 89 — cartography + interaction batch:
Chaikin corner-cutting smoothing (pre-scaled exact quarter points,
unrolled-round oracle), shoelace polygon centroid, ring-weighted
focal smoothing (discrete Gaussian), and gravity spatial-interaction
residual inputs over the OD matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_cells
from pdal_spark.operators import features as ops_features
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import transform as ops_transform

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# chaikin_smooth — per-user tracks, 2 rounds.
# ---------------------------------------------------------------------------

_CK_ROUNDS = 2
_CK_Q = 1 << 20
_CK_SCALE = 4 ** _CK_ROUNDS


def _ck_sql(rounds: int) -> str:
    parts = [f"""
    WITH r0 AS MATERIALIZED (
      SELECT user_id AS k,
             CAST(floor(({G.geo_lon('event_id')}) * {_CK_Q})
                  AS BIGINT) * {_CK_SCALE} AS x,
             CAST(floor(({G.geo_lat('event_id')}) * {_CK_Q})
                  AS BIGINT) * {_CK_SCALE} AS y,
             row_number() OVER (
               PARTITION BY user_id ORDER BY event_id
             ) - 1 AS seq
      FROM events
    )"""]
    prev = "r0"
    for t in range(1, rounds + 1):
        parts.append(f""",
    e{t} AS MATERIALIZED (
      SELECT k, seq, x, y,
             lead(x) OVER w AS nx, lead(y) OVER w AS ny,
             max(seq) OVER (PARTITION BY k) AS last
      FROM {prev}
      WINDOW w AS (PARTITION BY k ORDER BY seq)
    ),
    r{t} AS MATERIALIZED (
      SELECT k, seq * 2 + 1 AS seq,
             (3 * x + nx) // 4 AS x, (3 * y + ny) // 4 AS y
      FROM e{t} WHERE nx IS NOT NULL
      UNION ALL
      SELECT k, seq * 2 + 2,
             (x + 3 * nx) // 4, (y + 3 * ny) // 4
      FROM e{t} WHERE nx IS NOT NULL
      UNION ALL
      SELECT k, CASE WHEN seq = 0 THEN 0 ELSE seq * 2 + 1 END,
             x, y
      FROM e{t} WHERE seq = 0 OR seq = last
    )""")
        prev = f"r{t}"
    parts.append(f"""
    SELECT k AS user_id, CAST(seq AS BIGINT) AS seq, x AS xq, y AS yq
    FROM {prev}
    """)
    return "".join(parts)


@gate("chaikin_smooth", _ck_sql(_CK_ROUNDS))
def q_chaikin_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_transform.chaikin_smooth(
        pts, rounds=_CK_ROUNDS, key_col="user_id",
        order_col="event_id", coord_q=_CK_Q,
    )


# ---------------------------------------------------------------------------
# polygon_centroid — vertex tables derived from per-user-bucket
# track points on the quantized grid (closed in seq order; the
# shoelace stats are well-defined for ANY vertex order).
# ---------------------------------------------------------------------------

_PC_Q = 1 << 10
_PC_MOD = 23  # sample: ~26 vertices per bucket at sf0.01

_PC_VERTS = f"""
    verts AS MATERIALIZED (
      SELECT user_id % 5 AS p,
             event_id AS s,
             CAST(floor(({G.geo_lon('event_id')}) * {_PC_Q})
                  AS BIGINT) AS vx,
             CAST(floor(({G.geo_lat('event_id')}) * {_PC_Q})
                  AS BIGINT) AS vy
      FROM events WHERE event_id % {_PC_MOD} = 0
    )
"""

_PC_SQL = f"""
    WITH {_PC_VERTS},
    e AS (
      SELECT p, vx, vy,
             coalesce(lead(vx) OVER w, first_value(vx) OVER w) AS nx,
             coalesce(lead(vy) OVER w, first_value(vy) OVER w) AS ny
      FROM verts
      WINDOW w AS (PARTITION BY p ORDER BY s)
    )
    SELECT p AS poly_id,
           CAST(sum(vx * ny - nx * vy) AS BIGINT) AS a2,
           CAST(sum((vx + nx) * (vx * ny - nx * vy)) AS BIGINT)
             AS cx6,
           CAST(sum((vy + ny) * (vx * ny - nx * vy)) AS BIGINT)
             AS cy6,
           CAST(sum((vx + nx) * (vx * ny - nx * vy)) AS DOUBLE)
             / CAST(3 * sum(vx * ny - nx * vy) AS DOUBLE) AS cx,
           CAST(sum((vy + ny) * (vx * ny - nx * vy)) AS DOUBLE)
             / CAST(3 * sum(vx * ny - nx * vy) AS DOUBLE) AS cy
    FROM e GROUP BY p
"""


@gate("polygon_centroid", _PC_SQL)
def q_polygon_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _PC_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id")
    verts = pts.select(
        (F.col("user_id") % 5).alias("poly_id"),
        F.col("event_id").alias("seq"),
        F.floor(F.col("lon") * _PC_Q).cast("long").alias("xq"),
        F.floor(F.col("lat") * _PC_Q).cast("long").alias("yq"),
    )
    return ops_features.polygon_centroid(verts)


# ---------------------------------------------------------------------------
# focal_weighted — k=2 discrete Gaussian (4, 2, 1) on the res-4
# count lattice.
# ---------------------------------------------------------------------------

_FW_W = (4, 2, 1)


def _fw_sql() -> str:
    wcase = ("CASE greatest(abs(offs.dx), abs(offs.dy))"
             + "".join(f" WHEN {r} THEN {w}"
                       for r, w in enumerate(_FW_W))
             + " END")
    offs_vals = ", ".join(f"({d})" for d in (-2, -1, 0, 1, 2))
    return f"""
    WITH cellv AS MATERIALIZED (
      SELECT {G.qcell('lat', 'lon', _FD_RES)} AS c, count(*) AS xv
      FROM (SELECT event_id, {G.geo_lat('event_id')} AS lat,
                   {G.geo_lon('event_id')} AS lon FROM events) pts
      GROUP BY 1
    ),
    offs AS (
      SELECT dx.dx AS dx, dy.dy AS dy
      FROM (VALUES {offs_vals}) dx(dx), (VALUES {offs_vals}) dy(dy)
    )
    SELECT a.c AS cell, count(*) AS n_terms,
           CAST(sum(({wcase}) * b.xv) AS BIGINT) AS wsum,
           CAST(sum({wcase}) AS BIGINT) AS wtot,
           CAST((sum(({wcase}) * b.xv) * {ops_raster.FOCAL_Q})
                // sum({wcase}) AS BIGINT) AS wmean_q
    FROM cellv a, offs
    JOIN cellv b
      ON b.c = {G.qcell_neighbor('a.c', 'offs.dx', 'offs.dy',
                                 _FD_RES, DK)}
    WHERE {G.qcell_neighbor_valid('a.c', 'offs.dy', _FD_RES, DK)}
    GROUP BY a.c
"""


@gate("focal_weighted", _fw_sql())
def q_focal_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_raster.focal_weighted(
        _fd_cells(spark, sf_dir), res=_FD_RES, weights=_FW_W,
        cell="cell", value="x",
    )


# ---------------------------------------------------------------------------
# gravity_residuals — over the od_flows fixture (res 6).
# ---------------------------------------------------------------------------

_GR_RES = 6


def _gr_sql() -> str:
    n = 1 << _GR_RES
    ix_o, iy_o = G.qcell_deconstruct("f.o_cell", DK)
    ix_d, iy_d = G.qcell_deconstruct("f.d_cell", DK)
    dxw = (f"least((({ix_o}) - ({ix_d}) + {n} * 4) % {n},"
           f" (({ix_d}) - ({ix_o}) + {n} * 4) % {n})")
    dy = f"(({iy_o}) - ({iy_d}))"
    return f"""
    WITH pts AS (
      SELECT user_id, event_id,
             {G.qcell(G.geo_lat('event_id'), G.geo_lon('event_id'),
                      _GR_RES)} AS cell
      FROM events
    ),
    ends AS (
      SELECT user_id, arg_min(cell, event_id) AS o_cell,
             arg_max(cell, event_id) AS d_cell
      FROM pts GROUP BY user_id
    ),
    flows AS MATERIALIZED (
      SELECT o_cell, d_cell, count(*) AS n_trips
      FROM ends GROUP BY o_cell, d_cell
    ),
    ot AS (SELECT o_cell, sum(n_trips) AS o_tot FROM flows
           GROUP BY o_cell),
    dt AS (SELECT d_cell, sum(n_trips) AS d_tot FROM flows
           GROUP BY d_cell)
    SELECT f.o_cell, f.d_cell, f.n_trips,
           CAST(o_tot AS BIGINT) AS o_tot,
           CAST(d_tot AS BIGINT) AS d_tot,
           CAST(({dxw}) * ({dxw}) + ({dy}) * ({dy}) AS BIGINT) AS d2,
           CAST(CASE WHEN ({dxw}) * ({dxw}) + ({dy}) * ({dy}) > 0
                THEN (o_tot * d_tot * {ops_h3.GRAV_Q})
                     // (({dxw}) * ({dxw}) + ({dy}) * ({dy}))
                END AS BIGINT) AS expect_q
    FROM flows f
    JOIN ot ON ot.o_cell = f.o_cell
    JOIN dt ON dt.d_cell = f.d_cell
"""


@gate("gravity_residuals", _gr_sql())
def q_gravity_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_h3.gravity_residuals(
        pts, key="user_id", order="event_id", res=_GR_RES
    )

