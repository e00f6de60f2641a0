"""Gate registry extension 4 — ground classification
(filters.smrf / filters.pmf as sparse-grid morphology). Imported
from gate_ext3 (end of chain).

The DuckDB oracles are generated from the same driver-side parameter
series the engine uses (`ground.pmf_windows`, slope*cell*r
thresholds), and every arithmetic step mirrors the Spark expression
tree op-for-op (min/max/sub/abs/sqrt, power-of-two divisors), so the
integer class outputs hash-compare exactly with no rounding.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import DK, _PTS, _points, _t, gate
from pdal_spark.operators import ground as ops_ground

# points with an elevation payload: events.value as z
_ZPTS = _PTS.replace(
    "SELECT event_id,", "SELECT event_id, value AS z,"
)

_OFFS_SQL = "(VALUES (0,0),(1,0),(-1,0),(0,1),(0,-1)) AS o(dx, dy)"


def _morph_cte(name: str, src: str, how: str) -> str:
    """One unit diamond erosion (min) / dilation (max) over the
    occupied domain — gather formulation, equi-join on exploded
    offsets (same result as the engine's scatter + semi-join)."""
    return f"""{name} AS (
      SELECT t.cx, t.cy, {how}(s.v) AS v
      FROM (SELECT d.cx + o.dx AS scx, d.cy + o.dy AS scy, d.cx, d.cy
            FROM dom d CROSS JOIN {_OFFS_SQL}) t
      JOIN {src} s ON s.cx = t.scx AND s.cy = t.scy
      GROUP BY t.cx, t.cy)"""


_CELL = 16.0  # power of two: /cell and /2 are IEEE-exact
_SMRF_R = 3
_SMRF_SLOPE, _SMRF_SCALAR, _SMRF_THRESH = 0.15, 1.25, 5.0


def _grid_ctes() -> list[str]:
    c = G.fnum(_CELL)
    return [
        f"pts AS (SELECT event_id, z, "
        f"cast(floor(lon / {c}) as bigint) AS cx, "
        f"cast(floor(lat / {c}) as bigint) AS cy FROM {_ZPTS})",
        "g0 AS (SELECT cx, cy, min(z) AS v FROM pts GROUP BY 1, 2)",
        "dom AS (SELECT cx, cy FROM g0)",
    ]


def _smrf_sql() -> str:
    ctes = _grid_ctes()
    erosion = "g0"
    opens = []
    for r in range(1, _SMRF_R + 1):
        e = f"e{r}"
        ctes.append(_morph_cte(e, erosion, "min"))
        erosion = e
        cur = e
        for i in range(1, r + 1):
            o = f"o{r}_{i}"
            ctes.append(_morph_cte(o, cur, "max"))
            cur = o
        opens.append(cur)
    joins = " ".join(f"JOIN {o} USING (cx, cy)" for o in opens)
    scols = ", ".join(
        f"{o}.v AS s{r}" for r, o in enumerate(opens, start=1)
    )
    ctes.append(
        f"m AS (SELECT g0.cx, g0.cy, g0.v AS s0, {scols} "
        f"FROM g0 {joins})"
    )
    obj = " OR ".join(
        f"abs(s{r-1} - s{r}) > {G.fnum(_SMRF_SLOPE * _CELL * r)}"
        for r in range(1, _SMRF_R + 1)
    )
    ctes.append(
        f"zp AS (SELECT cx, cy, CASE WHEN {obj} THEN s{_SMRF_R} "
        f"ELSE s0 END AS zipro FROM m)"
    )
    ctes.append(
        f"sc AS (SELECT cx, cy, zipro, zipro / {G.fnum(_CELL)} AS s "
        f"FROM zp)"
    )
    ctes.append(
        """nb AS (
      SELECT a.cx, a.cy, a.zipro, a.s,
             xp.s AS xp, xm.s AS xm, yp.s AS yp, ym.s AS ym
      FROM sc a
      LEFT JOIN sc xp ON xp.cx = a.cx + 1 AND xp.cy = a.cy
      LEFT JOIN sc xm ON xm.cx = a.cx - 1 AND xm.cy = a.cy
      LEFT JOIN sc yp ON yp.cx = a.cx AND yp.cy = a.cy + 1
      LEFT JOIN sc ym ON ym.cx = a.cx AND ym.cy = a.cy - 1)"""
    )

    def g1(p: str, m: str) -> str:
        two = G.fnum(2.0)
        return (
            f"CASE WHEN {p} IS NOT NULL AND {m} IS NOT NULL "
            f"THEN ({p} - {m}) / {two} "
            f"WHEN {p} IS NOT NULL THEN {p} - s "
            f"WHEN {m} IS NOT NULL THEN s - {m} "
            f"ELSE {G.fnum(0.0)} END"
        )

    ctes.append(
        f"gr AS (SELECT cx, cy, zipro, {g1('xp', 'xm')} AS gx, "
        f"{g1('yp', 'ym')} AS gy FROM nb)"
    )
    ctes.append(
        f"th AS (SELECT cx, cy, zipro, {G.fnum(_SMRF_THRESH)} + "
        f"{G.fnum(_SMRF_SCALAR)} * sqrt(gx * gx + gy * gy) AS cthr "
        f"FROM gr)"
    )
    body = ",\n".join(ctes)
    return f"""
    WITH {body}
    SELECT p.event_id,
           CASE WHEN abs(t.zipro - p.z) <= t.cthr THEN 2 ELSE 1 END
             AS cls
    FROM pts p JOIN th t ON t.cx = p.cx AND t.cy = p.cy
    """


@gate("smrf_ground", _smrf_sql())
def q_smrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).join(
        _t(spark, sf_dir, "events").select(
            "event_id", F.col("value").alias("z")
        ),
        on="event_id",
    )
    out = ops_ground.smrf(
        pts, cell=_CELL, slope=_SMRF_SLOPE, window=_SMRF_R * _CELL,
        scalar=_SMRF_SCALAR, threshold=_SMRF_THRESH,
        x="lon", y="lat", z="z", id_col="event_id",
    )
    return out.select("event_id", "cls")


_PMF_KW = dict(
    cell_size=_CELL, max_window=9 * _CELL, slope=0.05,
    initial_distance=8.0, max_distance=40.0, exponential=True,
)


def _pmf_sql() -> str:
    series = ops_ground.pmf_windows(
        _PMF_KW["cell_size"], _PMF_KW["max_window"], _PMF_KW["slope"],
        _PMF_KW["initial_distance"], _PMF_KW["max_distance"],
        _PMF_KW["exponential"],
    )
    ctes = _grid_ctes()
    cur = "g0"
    surfs = []
    for j, (_ws, _ht, iters) in enumerate(series):
        for i in range(iters):
            n = f"p{j}e{i}"
            ctes.append(_morph_cte(n, cur, "min"))
            cur = n
        for i in range(iters):
            n = f"p{j}d{i}"
            ctes.append(_morph_cte(n, cur, "max"))
            cur = n
        surfs.append(cur)
    joins = " ".join(f"JOIN {s} USING (cx, cy)" for s in surfs)
    zcols = ", ".join(
        f"{s}.v AS z{j}" for j, s in enumerate(surfs)
    )
    ctes.append(
        f"m AS (SELECT dom.cx, dom.cy, {zcols} FROM dom {joins})"
    )
    ground = " AND ".join(
        f"(p.z - m.z{j}) < {G.fnum(ht)}"
        for j, (_ws, ht, _it) in enumerate(series)
    )
    body = ",\n".join(ctes)
    return f"""
    WITH {body}
    SELECT p.event_id,
           CASE WHEN {ground} THEN 2 ELSE 1 END AS cls
    FROM pts p JOIN m ON m.cx = p.cx AND m.cy = p.cy
    """


@gate("pmf_ground", _pmf_sql())
def q_pmf(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).join(
        _t(spark, sf_dir, "events").select(
            "event_id", F.col("value").alias("z")
        ),
        on="event_id",
    )
    out = ops_ground.pmf(
        pts, x="lon", y="lat", z="z", id_col="event_id", **_PMF_KW
    )
    return out.select("event_id", "cls")


# ===========================================================================
# filters.optimalneighborhood / planefit / miniball — the remaining
# §2.7 neighborhood-features family (OptimalNeighborhoodFilter.cpp:
# 72-165, PlaneFitFilter.cpp:120-170, MiniballFilter.cpp:106-152)
# ===========================================================================
from pdal_spark.gate import _CPTS  # noqa: E402
from pdal_spark.gate import _cust_points  # noqa: E402
from pdal_spark.operators import features as ops_feat  # noqa: E402

_ND = (
    "sqrt(((a.lon - b.lon) * (a.lon - b.lon))"
    " + ((a.lat - b.lat) * (a.lat - b.lat)))"
)
_ON_KMIN, _ON_KMAX, _ON_CELL = 4, 8, 8.0


def _optneigh_sql() -> str:
    dec = "decimal(30,10)"
    cs = {
        "sx": "b.lon", "sy": "b.lat",
        "sxx": "b.lon * b.lon", "syy": "b.lat * b.lat",
        "sxy": "b.lon * b.lat",
    }
    cums = ", ".join(
        f"cast(sum(cast({e} as {dec})) OVER w as double) AS {n}"
        for n, e in cs.items()
    )
    return f"""
    WITH nn AS (
      SELECT a.c_custkey AS src_id, {_ND} AS dist, b.lon, b.lat,
             row_number() OVER (
               PARTITION BY a.c_custkey
               ORDER BY {_ND} ASC, b.c_custkey ASC
             ) AS r
      FROM {_CPTS} a, {_CPTS} b
    ),
    cum AS (
      SELECT src_id, r, dist, {cums.replace('b.lon', 'lon')
                                   .replace('b.lat', 'lat')}
      FROM (SELECT src_id, r, dist, lon AS "b.lon", lat AS "b.lat",
                   lon, lat FROM nn WHERE r <= {_ON_KMAX}) q
      WINDOW w AS (PARTITION BY src_id ORDER BY r
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    feat AS (
      SELECT src_id, r, dist,
             ((sxx - sx * sx / (r * {G.fnum(1.0)}))
               / ((r * {G.fnum(1.0)}) - {G.fnum(1.0)})) AS cxx,
             ((syy - sy * sy / (r * {G.fnum(1.0)}))
               / ((r * {G.fnum(1.0)}) - {G.fnum(1.0)})) AS cyy,
             ((sxy - sx * sy / (r * {G.fnum(1.0)}))
               / ((r * {G.fnum(1.0)}) - {G.fnum(1.0)})) AS cxy
      FROM cum WHERE r BETWEEN {_ON_KMIN} AND {_ON_KMAX}
    ),
    ent AS (
      SELECT src_id, r, dist,
             CASE WHEN p1 IS NULL THEN cast('infinity' as double)
                  ELSE round(-(CASE WHEN p1 > 0 THEN p1 * ln(p1)
                               ELSE {G.fnum(0.0)} END
                          + CASE WHEN p2 > 0 THEN p2 * ln(p2)
                                 ELSE {G.fnum(0.0)} END), 6)
             END AS e
      FROM (
        SELECT src_id, r, dist,
               CASE WHEN l1 + l2 > 0 THEN l1 / (l1 + l2) END AS p1,
               CASE WHEN l1 + l2 > 0 THEN l2 / (l1 + l2) END AS p2
        FROM (
          SELECT src_id, r, dist,
                 greatest((cxx + cyy) / {G.fnum(2.0)}
                   + sqrt(((cxx - cyy) / {G.fnum(2.0)})
                          * ((cxx - cyy) / {G.fnum(2.0)})
                          + cxy * cxy), {G.fnum(0.0)}) AS l1,
                 greatest((cxx + cyy) / {G.fnum(2.0)}
                   - sqrt(((cxx - cyy) / {G.fnum(2.0)})
                          * ((cxx - cyy) / {G.fnum(2.0)})
                          + cxy * cxy), {G.fnum(0.0)}) AS l2
          FROM feat) t1) t2
    )
    SELECT src_id AS c_custkey, r AS optimal_k,
           dist AS optimal_radius
    FROM (
      SELECT src_id, r, dist, row_number() OVER (
        PARTITION BY src_id ORDER BY e ASC, r ASC) AS rn
      FROM ent) f
    WHERE rn = 1
    """


@gate("optimal_neighborhood", _optneigh_sql())
def q_optneigh(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = ops_feat.optimal_neighborhood(
        pts, min_k=_ON_KMIN, max_k=_ON_KMAX, cell=_ON_CELL,
        x="lon", y="lat", id_col="c_custkey",
    )
    return out.select(
        "c_custkey",
        F.col("optimal_k").cast("int").alias("optimal_k"),
        "optimal_radius",
    )


_PF_K = 8


def _planefit_sql() -> str:
    dec = "decimal(30,10)"
    return f"""
    WITH nn AS (
      SELECT src_id, lon, lat FROM (
        SELECT a.c_custkey AS src_id, b.lon, b.lat,
               row_number() OVER (
                 PARTITION BY a.c_custkey
                 ORDER BY {_ND} ASC, b.c_custkey ASC
               ) AS r
        FROM {_CPTS} a, {_CPTS} b WHERE a.c_custkey <> b.c_custkey
      ) t WHERE r <= {_PF_K}
    ),
    mom AS (
      SELECT src_id, count(*) AS n,
             cast(sum(cast(lon as {dec})) as double) AS sx,
             cast(sum(cast(lat as {dec})) as double) AS sy,
             cast(sum(cast(lon * lon as {dec})) as double) AS sxx,
             cast(sum(cast(lat * lat as {dec})) as double) AS syy,
             cast(sum(cast(lon * lat as {dec})) as double) AS sxy
      FROM nn GROUP BY 1
    ),
    par AS (
      SELECT src_id, n, sx / n AS mx, sy / n AS my,
             CASE WHEN nrm > 0 THEN cxy / nrm
                  WHEN cxx <= cyy THEN {G.fnum(1.0)}
                  ELSE {G.fnum(0.0)} END AS vx,
             CASE WHEN nrm > 0 THEN (e2 - cxx) / nrm
                  WHEN cxx <= cyy THEN {G.fnum(0.0)}
                  ELSE {G.fnum(1.0)} END AS vy
      FROM (
        SELECT *, sqrt(cxy * cxy + (e2 - cxx) * (e2 - cxx)) AS nrm
        FROM (
          SELECT *, (cxx + cyy) / {G.fnum(2.0)}
                    - sqrt(((cxx - cyy) / {G.fnum(2.0)})
                           * ((cxx - cyy) / {G.fnum(2.0)})
                           + cxy * cxy) AS e2
          FROM (
            SELECT src_id, n, sx, sy,
                   (sxx - sx * sx / (n * {G.fnum(1.0)}))
                     / ((n * {G.fnum(1.0)}) - {G.fnum(1.0)}) AS cxx,
                   (syy - sy * sy / (n * {G.fnum(1.0)}))
                     / ((n * {G.fnum(1.0)}) - {G.fnum(1.0)}) AS cyy,
                   (sxy - sx * sy / (n * {G.fnum(1.0)}))
                     / ((n * {G.fnum(1.0)}) - {G.fnum(1.0)}) AS cxy
            FROM mom) c) e) f
    ),
    dbar AS (
      SELECT nn.src_id,
             cast(sum(cast(abs((nn.lon - p.mx) * p.vx
                               + (nn.lat - p.my) * p.vy)
                           as decimal(38,18))) as double)
               / (p.n * {G.fnum(1.0)}) AS db
      FROM nn JOIN par p ON p.src_id = nn.src_id
      GROUP BY nn.src_id, p.n
    )
    SELECT c.c_custkey,
           round(CASE WHEN d + db > 0 THEN d / (d + db)
                      ELSE {G.fnum(0.0)} END, 9) + {G.fnum(0.0)}
             AS planefit
    FROM (
      SELECT c.c_custkey,
             abs((c.lon - p.mx) * p.vx + (c.lat - p.my) * p.vy) AS d
      FROM {_CPTS} c JOIN par p ON p.src_id = c.c_custkey
    ) c JOIN dbar ON dbar.src_id = c.c_custkey
    """


@gate("planefit", _planefit_sql())
def q_planefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = ops_feat.plane_fit(
        pts, k=_PF_K, cell=_ON_CELL,
        x="lon", y="lat", id_col="c_custkey",
    )
    return out.select(
        "c_custkey",
        # + 0.0 normalizes IEEE -0.0 (DuckDB round can emit it; the
        # value-hash compares bit patterns)
        (F.round("planefit", 9) + F.lit(0.0)).alias("planefit"),
    )


_MB_K = 6


def _miniball_sql() -> str:
    return f"""
    WITH nn AS MATERIALIZED (
      SELECT src_id, r, lon AS qx, lat AS qy FROM (
        SELECT a.c_custkey AS src_id, b.lon, b.lat,
               row_number() OVER (
                 PARTITION BY a.c_custkey
                 ORDER BY {_ND} ASC, b.c_custkey ASC
               ) AS r
        FROM {_CPTS} a, {_CPTS} b WHERE a.c_custkey <> b.c_custkey
      ) t WHERE r <= {_MB_K}
    ),
    pair_c AS MATERIALIZED (
      SELECT a.src_id, (a.qx + b.qx) / {G.fnum(2.0)} AS ux,
             (a.qy + b.qy) / {G.fnum(2.0)} AS uy
      FROM nn a JOIN nn b ON a.src_id = b.src_id AND a.r < b.r
    ),
    tri_c AS MATERIALIZED (
      SELECT src_id,
             (a2 * (qby - qcy) + b2 * (qcy - qay)
              + c2 * (qay - qby)) / det AS ux,
             (a2 * (qcx - qbx) + b2 * (qax - qcx)
              + c2 * (qbx - qax)) / det AS uy
      FROM (
        SELECT a.src_id, a.qx AS qax, a.qy AS qay,
               b.qx AS qbx, b.qy AS qby, c.qx AS qcx, c.qy AS qcy,
               a.qx * a.qx + a.qy * a.qy AS a2,
               b.qx * b.qx + b.qy * b.qy AS b2,
               c.qx * c.qx + c.qy * c.qy AS c2,
               {G.fnum(2.0)} * (a.qx * (b.qy - c.qy)
                 + b.qx * (c.qy - a.qy) + c.qx * (a.qy - b.qy))
                 AS det
        FROM nn a
        JOIN nn b ON a.src_id = b.src_id AND a.r < b.r
        JOIN nn c ON a.src_id = c.src_id AND b.r < c.r
      ) t WHERE det <> 0
    ),
    scored AS (
      SELECT k.src_id, k.ux, k.uy,
             max((nn.qx - k.ux) * (nn.qx - k.ux)
                 + (nn.qy - k.uy) * (nn.qy - k.uy)) AS r2
      FROM (SELECT * FROM pair_c UNION ALL SELECT * FROM tri_c) k
      JOIN nn ON nn.src_id = k.src_id
      GROUP BY k.src_id, k.ux, k.uy
    ),
    best AS (
      SELECT src_id, ux, uy, sqrt(r2) AS rad FROM (
        SELECT src_id, ux, uy, r2, row_number() OVER (
          PARTITION BY src_id ORDER BY r2 ASC, ux ASC, uy ASC) AS rn
        FROM scored) s WHERE rn = 1
    )
    SELECT c.c_custkey,
           d / (d + {G.fnum(2.0)} * b.rad / sqrt({G.fnum(2.0)}))
             AS miniball
    FROM (
      SELECT c.c_custkey, c.lon AS px, c.lat AS py,
             sqrt((c.lon - b.ux) * (c.lon - b.ux)
                  + (c.lat - b.uy) * (c.lat - b.uy)) AS d,
             b.ux, b.uy
      FROM {_CPTS} c JOIN best b ON b.src_id = c.c_custkey
    ) c JOIN best b ON b.src_id = c.c_custkey
    """


@gate("miniball", _miniball_sql())
def q_miniball(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _cust_points(spark, sf_dir)
    out = ops_feat.miniball(
        pts, k=_MB_K, cell=_ON_CELL,
        x="lon", y="lat", id_col="c_custkey",
    )
    return out.select("c_custkey", "miniball")


# ===========================================================================
# filters.m3c2 — multiscale model-to-model cloud comparison
# (M3C2Filter.cpp:207-306), 2D analog over customer vs supplier
# point clouds
# ===========================================================================
_M3_NR, _M3_CR, _M3_HL = 10.0, 8.0, 16.0
_M3_BALL = math.sqrt(_M3_CR * _M3_CR + _M3_HL * _M3_HL)
_SUPP = (
    "(SELECT s_suppkey, "
    f"{G.geo_lat('s_suppkey')} AS lat, "
    f"{G.geo_lon('s_suppkey')} AS lon FROM supplier)"
)


def _m3c2_sql() -> str:
    d = "decimal(30,10)"
    d18 = "decimal(38,18)"

    def dsum(e, dd=d):
        return f"cast(sum(cast({e} as {dd})) as double)"

    def d2(ax, ay, bx, by):
        return (
            f"(({ax} - {bx}) * ({ax} - {bx})"
            f" + (({ay} - {by}) * ({ay} - {by})))"
        )

    nrm = "sqrt(cxy * cxy + (e2 - cxx) * (e2 - cxx))"
    t_expr = (
        "((b.lon - co.corex) * co.nvx + (b.lat - co.corey) * co.nvy)"
    )
    perp_expr = (
        "((b.lat - co.corey) * co.nvx - (b.lon - co.corex) * co.nvy)"
    )

    def cyl(name: str, cloud: str, bid: str, excl: str) -> str:
        return f"""{name} AS (
      SELECT co.src_id, {t_expr} AS t
      FROM cores co JOIN {cloud} b
        ON sqrt({d2('b.lon', 'b.lat', 'co.corex', 'co.corey')})
             <= {G.fnum(_M3_BALL)} {excl}
      WHERE abs({perp_expr}) <= {G.fnum(_M3_CR)}
        AND abs({t_expr}) <= {G.fnum(_M3_HL)})"""

    def stats(name: str, src: str) -> str:
        return f"""{name} AS (
      SELECT src_id, count(*) AS n,
             {dsum('t', d18)} AS s1, {dsum('t * t', d18)} AS s2
      FROM {src} GROUP BY 1 HAVING count(*) >= 1)"""

    return f"""
    WITH np AS (
      SELECT a.c_custkey AS src_id, b.lon AS nx, b.lat AS ny
      FROM {_CPTS} a JOIN {_CPTS} b
        ON sqrt({d2('a.lon', 'a.lat', 'b.lon', 'b.lat')})
             <= {G.fnum(_M3_NR)}
    ), s AS (
      SELECT src_id, count(*) AS n,
             {dsum('nx')} AS sx, {dsum('ny')} AS sy,
             {dsum('nx * nx')} AS sxx, {dsum('ny * ny')} AS syy,
             {dsum('nx * ny')} AS sxy
      FROM np GROUP BY src_id
    ), c AS (
      SELECT src_id,
             sxx / n - (sx / n) * (sx / n) AS cxx,
             syy / n - (sy / n) * (sy / n) AS cyy,
             sxy / n - (sx / n) * (sy / n) AS cxy
      FROM s
    ), e AS (
      SELECT src_id, cxx, cyy, cxy,
             ((cxx + cyy) / {G.fnum(2.0)})
               - sqrt(((cxx - cyy) / {G.fnum(2.0)})
                      * ((cxx - cyy) / {G.fnum(2.0)}) + cxy * cxy)
               AS e2
      FROM c
    ), nvec AS (
      SELECT src_id,
             CASE WHEN {nrm} > {G.fnum(0.0)} THEN cxy / {nrm}
                  WHEN cxx <= cyy THEN {G.fnum(1.0)}
                  ELSE {G.fnum(0.0)} END AS nx0,
             CASE WHEN {nrm} > {G.fnum(0.0)} THEN (e2 - cxx) / {nrm}
                  WHEN cxx <= cyy THEN {G.fnum(0.0)}
                  ELSE {G.fnum(1.0)} END AS ny0
      FROM e
    ), cores AS (
      SELECT v.src_id, p.lon AS corex, p.lat AS corey,
             CASE WHEN ny0 < 0 OR (ny0 = 0 AND nx0 < 0)
                  THEN -nx0 ELSE nx0 END AS nvx,
             CASE WHEN ny0 < 0 OR (ny0 = 0 AND nx0 < 0)
                  THEN -ny0 ELSE ny0 END AS nvy
      FROM nvec v JOIN {_CPTS} p ON p.c_custkey = v.src_id
    ),
    {cyl('cyl1', _CPTS, 'c_custkey', 'AND b.c_custkey <> co.src_id')},
    {cyl('cyl2', _SUPP, 's_suppkey', '')},
    {stats('st1', 'cyl1')},
    {stats('st2', 'cyl2')}
    SELECT a.src_id AS c_custkey,
           round(m2 - m1, 9) + 0.0e0 AS m3c2_distance,
           round({G.fnum(1.96)} * (sqrt(v1 / a.n + v2 / b.n)
                 + {G.fnum(0.0)}), 6) AS m3c2_uncertainty,
           cast(abs(m2 - m1) > {G.fnum(1.96)}
                * (sqrt(v1 / a.n + v2 / b.n) + {G.fnum(0.0)})
                as int) AS m3c2_significant,
           round(sqrt(v1), 6) AS m3c2_std_dev1,
           round(sqrt(v2), 6) AS m3c2_std_dev2,
           a.n AS n1, b.n AS n2
    FROM (
      SELECT src_id, n, s1 / n AS m1,
             round(greatest(s2 / n - (s1 / n) * (s1 / n),
                            {G.fnum(0.0)}), 12) AS v1
      FROM st1) a
    JOIN (
      SELECT src_id, n, s1 / n AS m2,
             round(greatest(s2 / n - (s1 / n) * (s1 / n),
                            {G.fnum(0.0)}), 12) AS v2
      FROM st2) b ON b.src_id = a.src_id
    """


@gate("m3c2_compare", _m3c2_sql())
def q_m3c2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import h3 as ops_h3
    from pdal_spark.operators.register import m3c2

    cust = _cust_points(spark, sf_dir)
    supp = ops_h3.geocode(
        _t(spark, sf_dir, "supplier"), "s_suppkey"
    ).select("s_suppkey", "lat", "lon")
    out = m3c2(
        cust, supp, normal_radius=_M3_NR, cyl_radius=_M3_CR,
        cyl_halflen=_M3_HL, x="lon", y="lat",
        id1="c_custkey", id2="s_suppkey", cell=8.0,
    )
    return out.select(
        "c_custkey",
        # + 0.0 on BOTH sides: DuckDB round() preserves -0.0
        # while Spark normalizes it; the dtype-sensitive hash
        # tells them apart (bit at sf0.001 where empty-ish
        # cylinders give m2 - m1 == -0.0)
        (F.round("m3c2_distance", 9) + F.lit(0.0))
        .alias("m3c2_distance"),
        # round(6): single-point / duplicate-t cylinders have true
        # variance 0 but engine-specific cancellation noise ~1e-14;
        # sqrt turns that into ~3e-7, absorbed at 6 decimals
        F.round("m3c2_uncertainty", 6).alias("m3c2_uncertainty"),
        "m3c2_significant",
        F.round("m3c2_std_dev1", 6).alias("m3c2_std_dev1"),
        F.round("m3c2_std_dev2", 6).alias("m3c2_std_dev2"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
    )


# ===========================================================================
# filters.csf — Cloth Simulation Filter (CSFilter.cpp, private/csf/
# Cloth.cpp). The oracle unrolls every simulation step; all cloth
# arithmetic is +,-,*,/ with driver-side literals, so the settled
# heights (and therefore the integer classes) match bit-for-bit.
# ===========================================================================
_CSF_RES, _CSF_STEP, _CSF_THR = 16.0, 0.65, 5.0
_CSF_RIGID, _CSF_ITERS, _CSF_GRAV, _CSF_DAMP = 3, 24, 2.0, 0.01
_CSF_OFFS = "(VALUES (1,0),(-1,0),(0,1),(0,-1)) AS o(dx, dy)"


def _csf_sql() -> str:
    relax = G.fnum(1.0 - 2.0 ** (-_CSF_RIGID))
    gdisp = G.fnum(-_CSF_GRAV * _CSF_STEP * _CSF_STEP)
    keep = G.fnum(1.0 - _CSF_DAMP)
    res = G.fnum(_CSF_RES)
    ctes = [
        f"pts AS MATERIALIZED (SELECT event_id, z, "
        f"cast(floor(lon / {res}) as bigint) AS cx, "
        f"cast(floor(lat / {res}) as bigint) AS cy FROM {_ZPTS})",
        "gi AS MATERIALIZED (SELECT cx, cy, max(-z) AS terr FROM pts"
        " GROUP BY 1, 2)",
        "dom AS MATERIALIZED (SELECT cx, cy FROM gi)",
        "p0 AS MATERIALIZED (SELECT cx, cy, terr, m.h0 AS h,"
        " m.h0 AS hp, true AS mv FROM gi CROSS JOIN"
        " (SELECT max(terr) AS h0 FROM gi) m)",
    ]
    prev = "p0"
    for i in range(1, _CSF_ITERS + 1):
        ctes.append(
            f"""ga{i} AS MATERIALIZED (
      SELECT cx, cy, terr, mv,
             CASE WHEN mv THEN h + (h - hp) * {keep} + {gdisp}
                  ELSE h END AS h,
             h AS hp
      FROM {prev})"""
        )
        ctes.append(
            f"""av{i} AS MATERIALIZED (
      SELECT t.cx, t.cy,
             cast(sum(cast(s.h as decimal(38,15))) as double)
               / cast(count(*) as double) AS nbavg
      FROM (SELECT d.cx + o.dx AS scx, d.cy + o.dy AS scy,
                   d.cx, d.cy
            FROM dom d CROSS JOIN {_CSF_OFFS}) t
      JOIN ga{i} s ON s.cx = t.scx AND s.cy = t.scy
      GROUP BY t.cx, t.cy)"""
        )
        ctes.append(
            f"""p{i} AS MATERIALIZED (
      SELECT cx, cy, terr,
             CASE WHEN mv AND h <= terr THEN terr ELSE h END AS h,
             CASE WHEN mv AND h <= terr THEN terr ELSE hp END AS hp,
             (mv AND NOT (h <= terr)) AS mv
      FROM (
        SELECT g.cx, g.cy, g.terr, g.hp, g.mv,
               CASE WHEN g.mv AND a.nbavg IS NOT NULL
                    THEN g.h + {relax} * (a.nbavg - g.h)
                    ELSE g.h END AS h
        FROM ga{i} g
        LEFT JOIN av{i} a ON a.cx = g.cx AND a.cy = g.cy) s)"""
        )
        prev = f"p{i}"
    body = ",\n".join(ctes)
    return f"""
    WITH {body}
    SELECT p.event_id,
           CASE WHEN abs((-p.z) - c.h) < {G.fnum(_CSF_THR)}
                THEN 2 ELSE 1 END AS cls
    FROM pts p JOIN {prev} c ON c.cx = p.cx AND c.cy = p.cy
    """


@gate("csf_ground", _csf_sql())
def q_csf(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).join(
        _t(spark, sf_dir, "events").select(
            "event_id", F.col("value").alias("z")
        ),
        on="event_id",
    )
    out = ops_ground.csf(
        pts, resolution=_CSF_RES, time_step=_CSF_STEP,
        class_threshold=_CSF_THR, rigidness=_CSF_RIGID,
        iterations=_CSF_ITERS, gravity=_CSF_GRAV, damping=_CSF_DAMP,
        x="lon", y="lat", z="z", id_col="event_id",
    )
    return out.select("event_id", "cls")


# filters.relaxationdartthrowing — decaying-radius Poisson selection
# (RelaxationDartThrowing.cpp; greedy = rows-only like sample_poisson,
# invariants pinned by tests/test_ground.py)
@gate("relaxation_dart", None)
def q_relaxation_dart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.sampling import (
        relaxation_dart_throwing,
    )

    pts = _cust_points(spark, sf_dir)
    out = relaxation_dart_throwing(
        pts, count=200, radius=12.0, decay=0.85,
        x="lon", y="lat", id_col="c_custkey",
    )
    return out.select("c_custkey", "rdt_radius")


# ===========================================================================
# kernels.eval — classification scoring (EvalKernel.cpp:120-176):
# per-label confusion counts + precision/recall/F1/accuracy
# ===========================================================================
from pdal_spark.operators import stats as ops_stats  # noqa: E402


@gate(
    "eval_classification",
    f"""
    WITH d AS (
      SELECT l_partkey % 3 AS t, l_suppkey % 3 AS p FROM lineitem
    ),
    cm AS (SELECT t, p, count(*) AS n FROM d GROUP BY 1, 2),
    tot AS (SELECT cast(sum(n) as double) AS total FROM cm),
    labels AS (
      SELECT t AS label FROM cm UNION SELECT p FROM cm
    ),
    tp AS (SELECT t AS label, n AS tp FROM cm WHERE t = p),
    bp AS (SELECT p AS label, sum(n) AS pred_n FROM cm GROUP BY 1),
    bt AS (SELECT t AS label, sum(n) AS truth_n FROM cm GROUP BY 1),
    j AS (
      SELECT l.label,
             coalesce(tp.tp, 0) AS tp,
             coalesce(bp.pred_n, 0) AS pred_n,
             coalesce(bt.truth_n, 0) AS truth_n
      FROM labels l
      LEFT JOIN tp ON tp.label = l.label
      LEFT JOIN bp ON bp.label = l.label
      LEFT JOIN bt ON bt.label = l.label
    ),
    m AS (
      SELECT label, tp,
             cast(tp as double) AS tpc,
             cast(pred_n - tp as double) AS fp,
             cast(truth_n - tp as double) AS fn, total
      FROM j CROSS JOIN tot
    ),
    r AS (
      SELECT label, tp, fp, fn, total - tpc - fp - fn AS tn,
             CASE WHEN tpc + fp > 0 THEN tpc / (tpc + fp)
                  ELSE {G.fnum(0.0)} END AS precision,
             CASE WHEN tpc + fn > 0 THEN tpc / (tpc + fn)
                  ELSE {G.fnum(0.0)} END AS recall,
             tpc, total
      FROM m
    )
    SELECT label, cast(tp as bigint) AS tp, cast(fp as bigint) AS fp,
           cast(fn as bigint) AS fn, cast(tn as bigint) AS tn,
           precision, recall,
           CASE WHEN precision + recall > 0
                THEN {G.fnum(2.0)} * precision * recall
                     / (precision + recall)
                ELSE {G.fnum(0.0)} END AS f1,
           (tpc + tn) / total AS accuracy
    FROM r
    """,
)
def q_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 3).alias("truth"),
        (F.col("l_suppkey") % 3).alias("cls"),
    )
    return ops_stats.eval_classification(li, "cls", "truth")


# ===========================================================================
# filters.lloydkmeans — DETERMINISTIC Lloyd (upgrade of the rows-only
# pyspark.ml gate): initial centroids = k smallest-id points; every
# iteration is mirrorable, so labels hash-match exactly
# ===========================================================================
_KM_K, _KM_IT = 4, 5


def _kmeans_sql() -> str:
    dec = "decimal(38,15)"
    ctes = [
        f"pts AS MATERIALIZED (SELECT c_custkey AS pid, lon AS px,"
        f" lat AS py FROM {_CPTS} c)",
        f"""c0 AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY pid) - 1 AS idx,
             px AS cx, py AS cy
      FROM pts ORDER BY pid LIMIT {_KM_K})""",
    ]
    for i in range(1, _KM_IT + 1):
        ctes.append(
            f"""a{i} AS MATERIALIZED (
      SELECT pid, px, py, idx AS cid FROM (
        SELECT p.pid, p.px, p.py, c.idx,
               row_number() OVER (PARTITION BY p.pid ORDER BY
                 ((p.px - c.cx) * (p.px - c.cx)
                  + (p.py - c.cy) * (p.py - c.cy)) ASC,
                 c.idx ASC) AS rn
        FROM pts p CROSS JOIN c{i-1} c) t WHERE rn = 1)"""
        )
        if i < _KM_IT:
            ctes.append(
                f"""c{i} AS MATERIALIZED (
      SELECT o.idx, coalesce(u.cx, o.cx) AS cx,
             coalesce(u.cy, o.cy) AS cy
      FROM c{i-1} o LEFT JOIN (
        SELECT cid AS idx,
               cast(sum(cast(px as {dec})) as double)
                 / cast(count(*) as double) AS cx,
               cast(sum(cast(py as {dec})) as double)
                 / cast(count(*) as double) AS cy
        FROM a{i} GROUP BY cid) u ON u.idx = o.idx)"""
            )
    body = ",\n".join(ctes)
    return f"""
    WITH {body}
    SELECT pid AS c_custkey, cid AS cluster_id FROM a{_KM_IT}
    """


@gate("kmeans_exact", _kmeans_sql())
def q_kmeans_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.cluster import kmeans_exact

    pts = _cust_points(spark, sf_dir)
    out = kmeans_exact(
        pts, k=_KM_K, iters=_KM_IT, x="lon", y="lat",
        id_col="c_custkey",
    )
    return out.select("c_custkey", "cluster_id")


# ===========================================================================
# filters.skewnessbalancing (SkewnessBalancingFilter.cpp:79-125) —
# z-sorted running-skewness ground split; only skew SIGNS drive the
# classes (sign(skew) == sign(M3)), so pow/sqrt rounding can't flip
# ===========================================================================
def _skb_sql() -> str:
    dec = "decimal(38,15)"
    return f"""
    WITH t AS MATERIALIZED (
      SELECT event_id AS id,
             row_number() OVER w AS r,
             cast(sum(cast(value as {dec})) OVER w2 as double) AS s1,
             cast(sum(cast(value * value as {dec})) OVER w2
                  as double) AS s2,
             cast(sum(cast(value * value * value as {dec})) OVER w2
                  as double) AS s3
      FROM events
      WINDOW w AS (ORDER BY value, event_id),
             w2 AS (ORDER BY value, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW)
    ),
    s AS MATERIALIZED (
      SELECT id, r,
             CASE WHEN s2 - s1 * s1 / n > 0 THEN
               sqrt(n) * (s3 - {G.fnum(3.0)} * mean * s2
                          + {G.fnum(2.0)} * n * mean * mean * mean)
                 / pow(s2 - s1 * s1 / n, {G.fnum(1.5)})
             END AS skew
      FROM (SELECT id, r, cast(r as double) AS n, s1, s2, s3,
                   s1 / cast(r as double) AS mean FROM t) q
    ),
    x AS MATERIALIZED (
      SELECT s.*, lag(skew) OVER (ORDER BY r) AS lskew FROM s
    ),
    c AS (
      SELECT max(CASE WHEN skew > 0 AND lskew <= 0 THEN r END) AS b,
             (SELECT skew FROM s ORDER BY r DESC LIMIT 1) AS fskew
      FROM x
    )
    SELECT x.id AS event_id,
           CASE WHEN c.b IS NOT NULL
                THEN CASE WHEN x.r < c.b THEN 2 ELSE 1 END
                WHEN c.fskew <= 0 THEN 2 ELSE 1 END AS cls
    FROM x CROSS JOIN c
    """


@gate("skewness_balancing", _skb_sql())
def q_skb(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.col("value").alias("z")
    )
    out = ops_ground.skewness_balancing(
        ev, z="z", id_col="event_id"
    )
    return out.select("event_id", "cls")


# ===========================================================================
# filters.supervoxel (SupervoxelFilter.cpp:75-160) — grid-seeded
# boundary-refining local k-means, labels oracle-exact
# ===========================================================================
_SV_RES, _SV_IT = 16.0, 3


def _supervoxel_sql() -> str:
    dec = "decimal(38,15)"
    res = G.fnum(_SV_RES)

    def dmean(e):
        return (
            f"cast(sum(cast({e} as {dec})) as double)"
            f" / cast(count(*) as double)"
        )

    ctes = [
        f"""pts AS MATERIALIZED (
      SELECT c_custkey AS pid, lon AS px, lat AS py,
             cast(floor(lon / {res}) as bigint) AS gx,
             cast(floor(lat / {res}) as bigint) AS gy
      FROM {_CPTS} c)""",
        f"""s0 AS MATERIALIZED (
      SELECT gx AS sx, gy AS sy, {dmean('px')} AS cx,
             {dmean('py')} AS cy
      FROM pts GROUP BY gx, gy)""",
    ]
    offs = ("(VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),"
            "(1,-1),(1,0),(1,1)) AS o(dx, dy)")
    for i in range(1, _SV_IT + 1):
        ctes.append(
            f"""a{i} AS MATERIALIZED (
      SELECT pid, px, py, sx, sy FROM (
        SELECT p.pid, p.px, p.py, s.sx, s.sy,
               row_number() OVER (PARTITION BY p.pid ORDER BY
                 ((p.px - s.cx) * (p.px - s.cx)
                  + (p.py - s.cy) * (p.py - s.cy)) ASC,
                 s.sx ASC, s.sy ASC) AS rn
        FROM (SELECT pts.*, pts.gx + o.dx AS nsx,
                     pts.gy + o.dy AS nsy
              FROM pts CROSS JOIN {offs}) p
        JOIN s{i-1} s ON s.sx = p.nsx AND s.sy = p.nsy) t
      WHERE rn = 1)"""
        )
        if i < _SV_IT:
            ctes.append(
                f"""s{i} AS MATERIALIZED (
      SELECT o.sx, o.sy, coalesce(u.ncx, o.cx) AS cx,
             coalesce(u.ncy, o.cy) AS cy
      FROM s{i-1} o LEFT JOIN (
        SELECT sx, sy, {dmean('px')} AS ncx, {dmean('py')} AS ncy
        FROM a{i} GROUP BY sx, sy) u
        ON u.sx = o.sx AND u.sy = o.sy)"""
            )
    body = ",\n".join(ctes)
    return f"""
    WITH {body}
    SELECT pid AS c_custkey,
           (sx + {1 << 20}) * {1 << 21} + (sy + {1 << 20})
             AS cluster_id
    FROM a{_SV_IT}
    """


@gate("supervoxel", _supervoxel_sql())
def q_supervoxel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.cluster import supervoxel

    pts = _cust_points(spark, sf_dir)
    out = supervoxel(
        pts, resolution=_SV_RES, iters=_SV_IT,
        x="lon", y="lat", id_col="c_custkey",
    )
    return out.select("c_custkey", "cluster_id")


# ===========================================================================
# filters.chipper — deterministic Morton-run variant (chipper_exact);
# the sampled range-partitioner production path stays rows-only
# ===========================================================================
_CHIP_CAP = 500


@gate(
    "chipper_exact",
    f"""
    SELECT event_id,
           cast(floor((cast(row_number() OVER (
                  ORDER BY {G.morton_from_lonlat('lat', 'lon', 26,
                                                 DK)},
                           event_id) as bigint) - 1)
                / {G.fnum(float(_CHIP_CAP))}) as int) AS chip_id
    FROM {_PTS}
    """,
)
def q_chipper_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.splitter import chipper_exact

    pts = _points(spark, sf_dir)
    out = chipper_exact(
        pts, _CHIP_CAP, lat="lat", lon="lon", id_col="event_id"
    )
    return out.select("event_id", "chip_id")


# ===========================================================================
# filters.crop with a CONCAVE polygon — the general path's pure-
# Catalyst division-free ray cast (CropFilter.cpp:316-321; previously
# only convex geometries were oracle-checked)
# ===========================================================================
_ARROW = [(-40.0, -30.0), (0.0, 40.0), (40.0, -30.0), (0.0, -5.0)]


@gate(
    "crop_concave",
    f"""
    SELECT event_id, 0 AS geom_id FROM {_PTS}
    WHERE {G.raycast_pip('lon', 'lat', [_ARROW])}
    """,
)
def q_crop_concave(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.crop import crop_polygons

    pts = _points(spark, sf_dir)
    wkt = ("POLYGON((" + ", ".join(
        f"{x} {y}" for x, y in _ARROW + [_ARROW[0]]) + "))")
    out = crop_polygons(pts, [(0, wkt)], x="lon", y="lat")
    return out.select("event_id", "geom_id")


# chain continues: corpus quality gates
