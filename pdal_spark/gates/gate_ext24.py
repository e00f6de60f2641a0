"""Gate registry extension 24 — sketch-algebra & layout-planning
batch: HLL set-operation estimates (union merge + inclusion-exclusion
intersection from mergeable registers), fixed-step trajectory
resampling (the densify-before-rasterize op), and the deterministic
small-file compaction planner (Iceberg/Delta OPTIMIZE bin-pack as a
pure function of the listing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import sketch as ops_sketch
from pdal_spark.operators import temporal as ops_temporal
from pdal_spark.operators.sketch import HLL_M, _RHO_K, hll_est_sql
from pdal_spark.plans import bucketing as ops_bucketing

# ---------------------------------------------------------------------------
# hll_intersect — user overlap between two event types, from
# registers only.
# ---------------------------------------------------------------------------

_HI_A, _HI_B = "click", "view"

_HI_H = G.mix_hash("user_id")
_HI_RHO = ops_sketch.hll_rho_sql("sfx")


def _hi_fold(tag: str, src: str) -> str:
    return f"""
    f_{tag} AS (
      SELECT count(*) AS n_used_{tag},
             sum(1::BIGINT << ({_RHO_K} - rho))
               + CAST({HLL_M} - count(*) AS BIGINT)
                 * (1::BIGINT << {_RHO_K}) AS sum_q_{tag}
      FROM {src}
    )"""


def _hi_est(tag: str) -> str:
    return (
        hll_est_sql()
        .replace("n_used", f"n_used_{tag}")
        .replace("sum_q", f"sum_q_{tag}")
    )


_HI_SQL = f"""
    WITH regs AS MATERIALIZED (
      SELECT g, bkt, max(rho) AS rho FROM (
        SELECT CASE WHEN event_type = '{_HI_A}' THEN 0 ELSE 1 END AS g,
               ({_HI_H} % {HLL_M}) AS bkt,
               {_HI_RHO} AS rho
        FROM (SELECT event_type, user_id,
                     (({_HI_H}) // {HLL_M}) AS sfx
              FROM events
              WHERE event_type IN ('{_HI_A}', '{_HI_B}')) s
      ) r GROUP BY g, bkt
    ),
    ru AS (SELECT bkt, max(rho) AS rho FROM regs GROUP BY bkt),
    {_hi_fold('a', '(SELECT * FROM regs WHERE g = 0) ra')},
    {_hi_fold('b', '(SELECT * FROM regs WHERE g = 1) rb')},
    {_hi_fold('u', 'ru')}
    SELECT n_used_a, sum_q_a, n_used_b, sum_q_b, n_used_u, sum_q_u,
           {_hi_est('a')} AS est_a,
           {_hi_est('b')} AS est_b,
           {_hi_est('u')} AS est_union,
           round(greatest(0.0e0,
             {_hi_est('a')} + {_hi_est('b')} - {_hi_est('u')}), 4)
             AS est_intersect
    FROM f_a, f_b, f_u
"""


@gate("hll_intersect", _HI_SQL)
def q_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_sketch.hll_intersect(
        ev, "event_type", "user_id", _HI_A, _HI_B
    )


# ---------------------------------------------------------------------------
# trajectory_resample — fixed-step densification; the interpolation
# formula text is shared verbatim (pure +,-,*,/,sqrt => IEEE-exact).
# ---------------------------------------------------------------------------

_TR_STEP = 5.0
_TR_ST = G.fnum(_TR_STEP)
_TR_LN = (
    "sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0))"
)
_TR_CAP = 64

_TR_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT user_id, {G.geo_lat('event_id')} AS lat,
             {G.geo_lon('event_id')} AS lon, ts, event_id
      FROM events
    ),
    legs AS (
      SELECT user_id,
             lat AS y0, lon AS x0,
             lead(lat) OVER w AS y1, lead(lon) OVER w AS x1,
             row_number() OVER w AS seq
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    n AS (
      SELECT *, CASE WHEN y1 IS NULL THEN 0 ELSE
        least(CAST({_TR_CAP} AS INT),
              CAST(floor({_TR_LN} / {_TR_ST}) AS INT)) END AS nn
      FROM legs
    ),
    e AS (
      SELECT n.*, CAST(t.i AS INT) AS i
      FROM n, unnest(range(nn + 1)) AS t(i)
      WHERE y1 IS NOT NULL OR t.i = 0
    )
    SELECT user_id, seq, i AS sub,
           CASE WHEN i = 0 THEN x0 ELSE
             x0 + (x1 - x0) * ((CAST(i AS DOUBLE) * {_TR_ST})
               / {_TR_LN}) END AS sx,
           CASE WHEN i = 0 THEN y0 ELSE
             y0 + (y1 - y0) * ((CAST(i AS DOUBLE) * {_TR_ST})
               / {_TR_LN}) END AS sy
    FROM e
"""


@gate("trajectory_resample", _TR_SQL)
def q_trajectory_resample(spark: SparkSession, sf_dir: str
                          ) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ops_h3.geocode(ev, "event_id")
    return ops_temporal.trajectory_resample(
        pts, step=_TR_STEP, max_points_per_leg=_TR_CAP
    )


# ---------------------------------------------------------------------------
# compaction_plan — deterministic bin-banding of a synthetic file
# listing (partition = user_id band, size from value).
# ---------------------------------------------------------------------------

_CP_TARGET = 2_000_000

_CP_FILES = """
    (SELECT (user_id % 10) AS partition, event_id AS file_id,
            CAST(floor(CAST(value AS DOUBLE) * 1000.0e0) AS BIGINT)
              AS size_bytes
     FROM events)
"""

_CP_SQL = f"""
    WITH files AS MATERIALIZED (SELECT * FROM {_CP_FILES} f),
    o AS (
      SELECT partition, file_id, size_bytes,
             sum(size_bytes) OVER w - size_bytes AS cum,
             row_number() OVER w AS group_seq
      FROM files
      WINDOW w AS (PARTITION BY partition
                   ORDER BY size_bytes DESC, file_id ASC)
    )
    SELECT partition, file_id, size_bytes,
           CAST(cum // {_CP_TARGET} AS INT) AS "group", group_seq
    FROM o
"""


@gate("compaction_plan", _CP_SQL)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    files = ev.select(
        (F.col("user_id") % 10).alias("partition"),
        F.col("event_id").alias("file_id"),
        F.expr(
            "cast(floor(cast(value as double) * 1000.0e0) as bigint)"
        ).alias("size_bytes"),
    )
    return ops_bucketing.compaction_plan(files, _CP_TARGET)

