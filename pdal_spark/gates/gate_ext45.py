"""Gate registry extension 45 — Delaunay TIN batch (VERDICT r1 #7):
filters.delaunay, filters.hag_delaunay, FaceRasterFilter analog.

Oracle strategy: Delaunay is characterized non-procedurally — a
triple is a Delaunay triangle iff its circumcircle contains NO other
point strictly inside (unique in general position; the fixture is
checked free of cocircular quadruples). The SQL brute-forces that
definition (O(n^4) — fine at the 60-point fixture), while Spark runs
the real incremental kernel; both evaluate the same IEEE-double
determinants on integer coordinates (< 2^9: every term < 2^53, so
both sides are bit-exact). Barycentric interpolation divides — also
IEEE-exact (+,-,*,/ are correctly rounded in both engines) as long
as the expression SHAPE matches the numpy kernel, which the SQL
mirrors term for term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import delaunay as ops_delaunay

# fixture: 60 ground points (checked: no duplicate coords, no
# cocircular quadruple, 99 triangles) + 30 probe points
_GX = "CAST((pid * 48271) % 509 AS DOUBLE)"
_GY = "CAST((pid * 69621) % 503 AS DOUBLE)"
_PX = "CAST((pid * 24593) % 509 AS DOUBLE)"
_PY = "CAST((pid * 49297) % 503 AS DOUBLE)"
# ground z = ((pid*37)%400)/8 -> z*1000 = 125*X exactly; probe z =
# ((pid*53)%300)/4 -> 250*X exactly (mm quantization is lossless)
_GZMM = "CAST(((pid * 37) % 400) * 125 AS BIGINT)"
_PZMM = "CAST(((pid * 53) % 300) * 250 AS BIGINT)"

_PTS_SQL = f"""
  SELECT c_custkey AS pid, {_GX} AS x, {_GY} AS y, {_GZMM} AS zmm
  FROM customer WHERE c_custkey <= 60
"""

# Delaunay triangles of the ground set by the empty-circumcircle
# definition. orient sign normalizes the in-circle determinant.
_TRI_SQL = f"""
  pts AS MATERIALIZED ({_PTS_SQL}),
  tri AS MATERIALIZED (
    SELECT i.pid AS a, j.pid AS b, k.pid AS c,
           i.x AS ax, i.y AS ay, CAST(i.zmm AS DOUBLE) AS az,
           j.x AS bx, j.y AS by, CAST(j.zmm AS DOUBLE) AS bz,
           k.x AS cx, k.y AS cy, CAST(k.zmm AS DOUBLE) AS cz
    FROM pts i, pts j, pts k
    WHERE i.pid < j.pid AND j.pid < k.pid
      AND ((j.x - i.x) * (k.y - i.y)
           - (j.y - i.y) * (k.x - i.x)) <> 0.0e0
      AND NOT EXISTS (
        SELECT 1 FROM pts d
        WHERE d.pid NOT IN (i.pid, j.pid, k.pid)
          AND sign((j.x - i.x) * (k.y - i.y)
                   - (j.y - i.y) * (k.x - i.x))
              * ((i.x - d.x) * ((j.y - d.y)
                   * ((k.x - d.x) * (k.x - d.x)
                      + (k.y - d.y) * (k.y - d.y))
                 - (k.y - d.y)
                   * ((j.x - d.x) * (j.x - d.x)
                      + (j.y - d.y) * (j.y - d.y)))
               - (i.y - d.y) * ((j.x - d.x)
                   * ((k.x - d.x) * (k.x - d.x)
                      + (k.y - d.y) * (k.y - d.y))
                 - (k.x - d.x)
                   * ((j.x - d.x) * (j.x - d.x)
                      + (j.y - d.y) * (j.y - d.y)))
               + ((i.x - d.x) * (i.x - d.x)
                  + (i.y - d.y) * (i.y - d.y))
                 * ((j.x - d.x) * (k.y - d.y)
                    - (k.x - d.x) * (j.y - d.y))) > 0.0e0
      )
  )
"""


def _ground_pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.where(F.col("c_custkey") <= 60).select(
        F.col("c_custkey").alias("pid"),
        F.expr("CAST((c_custkey * 48271) % 509 AS DOUBLE)").alias("x"),
        F.expr("CAST((c_custkey * 69621) % 503 AS DOUBLE)").alias("y"),
        F.expr("CAST(((c_custkey * 37) % 400) AS DOUBLE) / 8.0e0")
        .alias("z"),
        F.lit(2).alias("cls"),
    )


_DT_SQL = f"""
  WITH {_TRI_SQL}
  SELECT a, b, c FROM tri
"""


@gate("delaunay_tin", _DT_SQL)
def q_delaunay_tin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filters.delaunay (DelaunayFilter.cpp:63-96) on the 60-point
    fixture — exact global triangulation (cell=None)."""
    pts = _ground_pts(spark, sf_dir)
    return ops_delaunay.delaunay_tin(pts, x="x", y="y", id_col="pid")


# barycentric weights — textually mirrors the numpy kernel:
#   den = (by-cy)*(ax-cx) + (cx-bx)*(ay-cy)
#   w1  = ((by-cy)*(px-cx) + (cx-bx)*(py-cy)) / den
#   w2  = ((cy-ay)*(px-cx) + (ax-cx)*(py-cy)) / den
#   w3  = 1 - w1 - w2;  val = w1*az + w2*bz + w3*cz
_DEN = "((by - cy) * (ax - cx) + (cx - bx) * (ay - cy))"
_W1 = f"(((by - cy) * (p.x - cx) + (cx - bx) * (p.y - cy)) / {_DEN})"
_W2 = f"(((cy - ay) * (p.x - cx) + (ax - cx) * (p.y - cy)) / {_DEN})"
_W3 = f"(1.0e0 - {_W1} - {_W2})"

_HD_SQL = f"""
  WITH {_TRI_SQL},
  probes AS MATERIALIZED (
    SELECT c_custkey AS pid, {_PX} AS x, {_PY} AS y, {_PZMM} AS zmm
    FROM customer WHERE c_custkey > 60 AND c_custkey <= 90
  ),
  contained AS (
    SELECT p.pid, p.zmm,
           CAST(floor({_W1} * az + {_W2} * bz + {_W3} * cz
                      + 0.5e0) AS BIGINT) AS gmm,
           row_number() OVER (
             PARTITION BY p.pid ORDER BY t.a, t.b, t.c
           ) AS rn
    FROM probes p JOIN tri t
      ON {_W1} >= 0.0e0 AND {_W2} >= 0.0e0 AND {_W3} >= 0.0e0
  ),
  nearest AS (
    SELECT p.pid, p.zmm, g.zmm AS gmm,
           row_number() OVER (
             PARTITION BY p.pid
             ORDER BY (g.x - p.x) * (g.x - p.x)
                      + (g.y - p.y) * (g.y - p.y) ASC, g.pid ASC
           ) AS rn
    FROM probes p, pts g
  )
  SELECT pid, CAST(0 AS BIGINT) AS hag_mm FROM pts
  UNION ALL
  SELECT p.pid,
         p.zmm - coalesce(
           (SELECT gmm FROM contained c
            WHERE c.pid = p.pid AND c.rn = 1),
           (SELECT gmm FROM nearest n
            WHERE n.pid = p.pid AND n.rn = 1)
         ) AS hag_mm
  FROM probes p
"""


@gate("hag_delaunay", _HD_SQL)
def q_hag_delaunay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filters.hag_delaunay (HagDelaunayFilter.cpp:129-235): HAG via
    barycentric interpolation over the ground TIN; hull-exterior
    probes fall back to the nearest ground z."""
    cust = _t(spark, sf_dir, "customer")
    probes = cust.where(
        (F.col("c_custkey") > 60) & (F.col("c_custkey") <= 90)
    ).select(
        F.col("c_custkey").alias("pid"),
        F.expr("CAST((c_custkey * 24593) % 509 AS DOUBLE)").alias("x"),
        F.expr("CAST((c_custkey * 49297) % 503 AS DOUBLE)").alias("y"),
        F.expr("CAST(((c_custkey * 53) % 300) AS DOUBLE) / 4.0e0")
        .alias("z"),
        F.lit(1).alias("cls"),
    )
    df = _ground_pts(spark, sf_dir).unionByName(probes)
    out = ops_delaunay.hag_delaunay(
        df, x="x", y="y", z="z", cls="cls", id_col="pid",
        ground_class=2,
    )
    return out.select("pid", "hag_mm")


_FR_SQL = f"""
  WITH {_TRI_SQL},
  cells AS MATERIALIZED (
    SELECT gx.ix, gy.iy,
           CAST(gx.ix * 64 + 32 AS DOUBLE) AS x,
           CAST(gy.iy * 64 + 32 AS DOUBLE) AS y
    FROM (SELECT unnest(range(8)) AS ix) gx,
         (SELECT unnest(range(8)) AS iy) gy
  )
  SELECT ix, iy, min(val_mm) AS val_mm FROM (
    SELECT p.ix, p.iy,
           CAST(floor({_W1} * az + {_W2} * bz + {_W3} * cz
                      + 0.5e0) AS BIGINT) AS val_mm
    FROM cells p JOIN tri t
      ON {_W1} >= 0.0e0 AND {_W2} >= 0.0e0 AND {_W3} >= 0.0e0
  ) _v GROUP BY ix, iy
"""


@gate("faceraster_tin", _FR_SQL)
def q_faceraster_tin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FaceRasterFilter.cpp:89-126 analog: barycentric TIN raster
    over an 8x8 grid at resolution 64 (integer cell centers keep the
    arithmetic IEEE-exact on both sides)."""
    pts = _ground_pts(spark, sf_dir)
    return ops_delaunay.tin_rasterize(
        pts, resolution=64.0, origin_x=0.0, origin_y=0.0,
        width=8, height=8, x="x", y="y", z="z", id_col="pid",
    )


# ---------------------------------------------------------------------------
# filters.colorinterp k-stddev mode (ColorinterpFilter.cpp:129,
# 205-208): bounds = mean +- k * population stddev. Oracled by
# mirroring the op's FIXED scalar order (mean = s/n; var = ss/n -
# mean*mean; std = sqrt) on an integer-valued dimension — every step
# is IEEE-exact on both engines (VERDICT r1 #10).
# ---------------------------------------------------------------------------
from pdal_spark import sqlgen as G  # noqa: E402

_CS_K = 2.0
_CS_RAMP = [(0, 0, 255), (0, 128, 192), (0, 255, 128),
            (128, 255, 0), (192, 128, 0), (255, 0, 0)]


def _colorinterp_stddev_sql() -> str:
    n = len(_CS_RAMP)
    b = (
        "least(greatest(cast(floor((v - mn) / dd * "
        f"{n}) as int), 0), {n - 1})"
    )
    chans = []
    for i, ch in enumerate(["red", "green", "blue"]):
        cases = " ".join(
            f"WHEN {j} THEN {_CS_RAMP[j][i]}" for j in range(n)
        )
        chans.append(f"(CASE {b} {cases} END) AS {ch}")
    return f"""
    WITH vals AS MATERIALIZED (
      SELECT event_id, floor(value * 16.0e0) AS v FROM events
    ),
    agg AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(v AS DECIMAL(30,10))) AS DOUBLE) AS s,
             CAST(sum(CAST(v * v AS DECIMAL(30,10))) AS DOUBLE) AS ss
      FROM vals
    ),
    st AS (
      SELECT s / n AS mean,
             ss / n - (s / n) * (s / n) AS var FROM agg
    ),
    sd AS (
      SELECT mean,
             CASE WHEN var > 0.0e0 THEN sqrt(var)
                  ELSE 0.0e0 END AS std FROM st
    ),
    bb AS (
      SELECT mean - {G.fnum(_CS_K)} * std AS mn,
             (mean + {G.fnum(_CS_K)} * std)
               - (mean - {G.fnum(_CS_K)} * std) AS dd
      FROM sd
    )
    SELECT event_id, {', '.join(chans)}
    FROM vals CROSS JOIN bb
    """


@gate("colorinterp_stddev", _colorinterp_stddev_sql())
def q_colorinterp_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.transform import colorinterp_stddev

    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.expr("floor(value * 16.0e0)").alias("v")
    )
    out = colorinterp_stddev(ev, "v", k=_CS_K, ramp=_CS_RAMP)
    return out.select("event_id", "red", "green", "blue")


# ---------------------------------------------------------------------------
# filters.normal refine (NormalFilter.cpp:64-66 MST walk): greedy-
# forest orientation propagation. Deterministic but iterative-join
# procedural — rows-only gate; pytest pins line/component semantics
# (tests/test_batch30_ops.py).
# ---------------------------------------------------------------------------


@gate("normals_refine", None)
def q_normals_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import h3 as ops_h3
    from pdal_spark.operators.features import (
        neighborhood_features, normals_refine,
    )

    cust = _t(spark, sf_dir, "customer").limit(2000)
    pts = ops_h3.geocode(cust, "c_custkey").select(
        F.col("c_custkey").alias("pid"), "lon", "lat"
    )
    feat = neighborhood_features(pts, radius=4.0, id_col="pid")
    out = normals_refine(
        feat.select("pid", "lon", "lat", "normal_x", "normal_y"),
        radius=4.0, id_col="pid",
    )
    return out.select("pid", "normal_x", "normal_y").orderBy("pid")


# ---------------------------------------------------------------------------
# filters.litree (LiTreeFilter.cpp:120-296, Li et al. 2012):
# tallest-first sequential tree segmentation. Deterministic but
# inherently order-dependent (the reference classifies in U order) —
# rows-only gate; pytest pins two-tree separation + termination
# semantics (tests/test_batch30_ops.py).
# ---------------------------------------------------------------------------


@gate("litree_segment", None)
def q_litree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import h3 as ops_h3
    from pdal_spark.operators.cluster import litree

    cust = _t(spark, sf_dir, "customer").limit(1500)
    pts = ops_h3.geocode(cust, "c_custkey").select(
        F.col("c_custkey").alias("pid"), "lon", "lat",
        F.expr(
            "CAST((c_custkey * 41) % 200 AS DOUBLE) / 10.0e0"
        ).alias("hag"),
    )
    out = litree(pts, min_points=5, min_height=3.0, cell=24.0)
    return out.select("pid", "tree_id").orderBy("pid")
