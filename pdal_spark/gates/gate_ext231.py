"""Gate registry extension 231 — the two remaining SURVEY §2.7 named
ops (VERDICT r2 #4): filters.estimaterank and
filters.approximatecoplanar as first-class operators over the kNN
3x3-covariance closed-form eigenvalue kernel.

Oracle strategy: the eigenvalues come from the trigonometric closed
form (acos/cos — INEXACT in the last ulps cross-engine), but both ops
emit only INTEGER labels from comparisons whose margins are many
orders of magnitude above ulp noise on this fixture (planar
neighborhoods have ev0 ~ 1e-15 vs thresholds ~ 1e-1), so the gate is
hash-exact. The SQL mirrors the Spark expression tree textually —
same literals, same associativity (features3d._eig3_closed_form).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import features3d as f3

_ER_K = 8
_ER_R0 = 4.0
_ER_THRESH = 0.01
# mixed-geometry z: western hemisphere lies EXACTLY on the plane
# z = 2x + 3y (rank-2 / coplanar neighborhoods), eastern hemisphere
# gets the scattered pseudo-random height (rank-3)
_ER_Z = (
    "(CASE WHEN lon < 0.0e0"
    " THEN ((2.0e0 * lon) + (3.0e0 * lat))"
    " ELSE (CAST((c_custkey * 7) % 500 AS DOUBLE) / 25.0e0) END)"
)


def _pts_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators import h3 as ops_h3

    cust = _t(spark, sf_dir, "customer")
    pts = ops_h3.geocode(cust, "c_custkey")
    return pts.select(
        "c_custkey", "lat", "lon", F.expr(_ER_Z).alias("z")
    )


def _eig_sql(final_select: str) -> str:
    """Shared oracle scaffold: kNN-8 (self included) -> decimal-exact
    covariance -> closed-form ascending eigenvalues -> final_select
    (which sees columns src_id, n, ev0, ev1, ev2)."""
    p3 = (
        "(SELECT c_custkey, lat, lon, "
        f"{_ER_Z} AS z FROM "
        f"(SELECT c_custkey, {G.geo_lat('c_custkey')} AS lat,"
        f" {G.geo_lon('c_custkey')} AS lon FROM customer) _g)"
    )
    d3 = ("sqrt((b.lon - a.lon) * (b.lon - a.lon)"
          " + (b.lat - a.lat) * (b.lat - a.lat)"
          " + (b.z - a.z) * (b.z - a.z))")
    dec = "decimal(30,10)"

    def dsum(e: str) -> str:
        return f"cast(sum(cast({e} as {dec})) as double)"

    two3pi = G.fnum(2.0 * math.pi / 3.0)
    return f"""
    WITH ranked AS MATERIALIZED (
      SELECT a.c_custkey AS src_id,
             b.lon AS nx, b.lat AS ny, b.z AS nz,
             row_number() OVER (
               PARTITION BY a.c_custkey
               ORDER BY {d3} ASC, b.c_custkey ASC
             ) AS nn_rank
      FROM {p3} a JOIN {p3} b ON true
    ), s AS MATERIALIZED (
      SELECT src_id, count(*) AS n,
             {dsum('nx')} AS sx, {dsum('ny')} AS sy,
             {dsum('nz')} AS sz,
             {dsum('nx * nx')} AS sxx, {dsum('ny * ny')} AS syy,
             {dsum('nz * nz')} AS szz,
             {dsum('nx * ny')} AS sxy, {dsum('nx * nz')} AS sxz,
             {dsum('ny * nz')} AS syz
      FROM ranked WHERE nn_rank <= {_ER_K} GROUP BY src_id
    ), c AS MATERIALIZED (
      SELECT src_id, n,
             sxx / n - (sx / n) * (sx / n) AS cxx,
             syy / n - (sy / n) * (sy / n) AS cyy,
             szz / n - (sz / n) * (sz / n) AS czz,
             sxy / n - (sx / n) * (sy / n) AS cxy,
             sxz / n - (sx / n) * (sz / n) AS cxz,
             syz / n - (sy / n) * (sz / n) AS cyz
      FROM s
    ), qp AS MATERIALIZED (
      SELECT *,
             (cxx + cyy + czz) / 3.0e0 AS q,
             ((cxx - ((cxx + cyy + czz) / 3.0e0))
                * (cxx - ((cxx + cyy + czz) / 3.0e0))
              + (cyy - ((cxx + cyy + czz) / 3.0e0))
                * (cyy - ((cxx + cyy + czz) / 3.0e0))
              + (czz - ((cxx + cyy + czz) / 3.0e0))
                * (czz - ((cxx + cyy + czz) / 3.0e0))
              + 2.0e0 * (cxy * cxy + cxz * cxz + cyz * cyz))
               AS p2
      FROM c
    ), pb AS MATERIALIZED (
      SELECT *, sqrt(p2 / 6.0e0) AS p FROM qp
    ), bb AS MATERIALIZED (
      SELECT *,
             (cxx - q) / p AS bxx, (cyy - q) / p AS byy,
             (czz - q) / p AS bzz,
             cxy / p AS bxy, cxz / p AS bxz, cyz / p AS byz
      FROM pb
    ), rr AS MATERIALIZED (
      SELECT *,
             greatest(-1.0e0, least(1.0e0,
               (bxx * (byy * bzz - byz * byz)
                - bxy * (bxy * bzz - byz * bxz)
                + bxz * (bxy * byz - byy * bxz)) / 2.0e0))
               AS r
      FROM bb
    ), ee AS MATERIALIZED (
      SELECT src_id, n, q, p2,
             CASE WHEN p2 <= 0.0e0 THEN q ELSE
               q + (2.0e0 * p) * cos(acos(r) / 3.0e0) END AS ev2,
             CASE WHEN p2 <= 0.0e0 THEN q ELSE
               q + (2.0e0 * p)
                 * cos((acos(r) / 3.0e0) + {two3pi}) END AS ev0
      FROM rr
    ), ef AS MATERIALIZED (
      SELECT src_id, n, ev0, ev2,
             ((3.0e0 * q) - ev0) - ev2 AS ev1
      FROM ee
    )
    {final_select}
    """


_ER_T = f"({G.fnum(_ER_THRESH)} * ev2)"
_ER_SQL = _eig_sql(f"""
    SELECT src_id AS c_custkey, CAST(n AS BIGINT) AS n_neighbors,
           CAST(CASE WHEN ev2 <= 0.0e0 THEN 0 ELSE
             (CASE WHEN ev0 > {_ER_T} THEN 1 ELSE 0 END)
             + (CASE WHEN ev1 > {_ER_T} THEN 1 ELSE 0 END)
             + (CASE WHEN ev2 > {_ER_T} THEN 1 ELSE 0 END)
           END AS INT) AS rank
    FROM ef
""")


@gate("estimate_rank", _ER_SQL)
def q_estimate_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _pts_rank(spark, sf_dir)
    return f3.estimate_rank(
        pts, knn=_ER_K, thresh=_ER_THRESH, radius0=_ER_R0,
        x="lon", y="lat", z="z", id_col="c_custkey",
    )


_AC_SQL = _eig_sql(f"""
    SELECT src_id AS c_custkey, CAST(n AS BIGINT) AS n_neighbors,
           CAST(CASE WHEN ev1 > {G.fnum(25.0)} * ev0
                      AND {G.fnum(6.0)} * ev1 > ev2
                 THEN 1 ELSE 0 END AS INT) AS coplanar
    FROM ef
""")


@gate("approximate_coplanar", _AC_SQL)
def q_approximate_coplanar(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pts = _pts_rank(spark, sf_dir)
    return f3.approximate_coplanar(
        pts, knn=_ER_K, thresh1=25.0, thresh2=6.0, radius0=_ER_R0,
        x="lon", y="lat", z="z", id_col="c_custkey",
    )
