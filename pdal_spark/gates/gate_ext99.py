"""Gate registry extension 99 — spherical polygon area and
Burrows' Delta stylometric pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import features as ops_features
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import textops as ops_text

_LAT = G.geo_lat("event_id")
_LON = G.geo_lon("event_id")

# ---------------------------------------------------------------------------
# spherical_area — Chamberlain-Duquette spherical excess over the
# polygon_centroid vertex-bucket fixture (raw degrees, not quantized)
# ---------------------------------------------------------------------------
_SA_MOD = 23

_SA_RAD = G.fnum(3.141592653589793 / 180.0)
_SA_DL = (
    f"((x1 - x0) - {G.fnum(360.0)}"
    f" * floor(((x1 - x0) + {G.fnum(180.0)}) / {G.fnum(360.0)}))"
)
_SA_TERM = (
    f"({_SA_DL} * {_SA_RAD})"
    f" * ({G.fnum(2.0)} + sin(y0 * {_SA_RAD}) + sin(y1 * {_SA_RAD}))"
)
_SA_R2H = G.fnum(6371.0088 * 6371.0088 / 2.0 / 1.0e9)

_SA_SQL = f"""
    WITH verts AS MATERIALIZED (
      SELECT user_id % 5 AS p, event_id AS s,
             {_LON} AS x0, {_LAT} AS y0
      FROM events WHERE event_id % {_SA_MOD} = 0
    ),
    e AS (
      SELECT p, x0, y0,
             coalesce(lead(x0) OVER w, first_value(x0) OVER w) AS x1,
             coalesce(lead(y0) OVER w, first_value(y0) OVER w) AS y1
      FROM verts
      WINDOW w AS (PARTITION BY p ORDER BY s)
    ),
    agg AS (
      SELECT p, CAST(count(*) AS BIGINT) AS n_verts,
             CAST(sum(CAST(floor({_SA_TERM} * {G.fnum(1.0e9)}
                  + {G.fnum(0.5)}) AS BIGINT)) AS BIGINT) AS exc_q
      FROM e GROUP BY p
    )
    SELECT p AS poly_id, n_verts, exc_q,
           round(abs(CAST(exc_q AS DOUBLE)) * {_SA_R2H}, 6)
             AS area_km2
    FROM agg
"""


@gate("spherical_area", _SA_SQL)
def q_spherical_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _SA_MOD == 0
    )
    pts = ops_h3.geocode(ev, "event_id")
    verts = pts.select(
        (F.col("user_id") % 5).alias("poly_id"),
        F.col("event_id").alias("seq"), "lon", "lat",
    )
    return ops_features.spherical_polygon_area(verts)


# ---------------------------------------------------------------------------
# burrows_delta — stylometric pair distance over the top-32 words
# ---------------------------------------------------------------------------
_BD_M = 32
_BD_B = 8
_BD_FQ = 1 << 20
_BD_ZQ = 1 << 10

_BD_SQL = f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id AS d, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    cnt AS MATERIALIZED (
      SELECT d, w, count(*) AS c FROM toks GROUP BY d, w
    ),
    lens AS (SELECT d, count(*) AS len FROM toks GROUP BY d),
    nd AS (SELECT count(*) AS nd FROM lens),
    top AS (
      SELECT w FROM (
        SELECT w, sum(c) AS tc FROM cnt GROUP BY w
        ORDER BY tc DESC, w LIMIT {_BD_M}
      ) t
    ),
    f AS MATERIALIZED (
      SELECT d, cnt.w, (c * {_BD_FQ}) // len AS f_q
      FROM cnt JOIN top USING (w) JOIN lens USING (d)
    ),
    mom AS (
      SELECT w, CAST(sum(f_q) AS BIGINT) AS s1,
             CAST(sum(f_q * f_q) AS BIGINT) AS s2
      FROM f GROUP BY w
    ),
    sig AS (
      SELECT w, sigma FROM (
        SELECT w, sqrt(CAST(s2 AS DOUBLE) / CAST(nd AS DOUBLE)
               - (CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE))
               * (CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE))) AS sigma
        FROM mom, nd
      ) s WHERE sigma > 0
    ),
    u AS MATERIALIZED (
      SELECT d, f.w,
             CAST(floor(CAST(f_q AS DOUBLE) / sigma
                  * {G.fnum(float(_BD_ZQ))}) AS BIGINT) AS u
      FROM f JOIN sig USING (w)
    ),
    s_doc AS (
      SELECT d, CAST(sum(u) AS BIGINT) AS s_u FROM u GROUP BY d
    ),
    shared AS (
      SELECT a.d AS da, b.d AS db,
             CAST(count(*) AS BIGINT) AS n_shared,
             CAST(sum(abs(a.u - b.u) - a.u - b.u) AS BIGINT) AS corr
      FROM u a JOIN u b
        ON b.w = a.w AND a.d % {_BD_B} = b.d % {_BD_B}
       AND a.d < b.d
      GROUP BY a.d, b.d
    )
    SELECT shared.da AS doc_a, shared.db AS doc_b, n_shared,
           CAST(sa.s_u + sb.s_u + corr AS BIGINT) AS delta_q
    FROM shared
    JOIN s_doc sa ON sa.d = shared.da
    JOIN s_doc sb ON sb.d = shared.db
"""


@gate("burrows_delta", _BD_SQL)
def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.burrows_delta(
        docs, top_m=_BD_M, block_mod=_BD_B, fq=_BD_FQ, zq=_BD_ZQ,
    )
