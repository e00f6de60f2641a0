"""Gate registry extension 160 — DSP/audio-feature batch: peak
picking, zero-crossing rate, framed short-time energy (over the
synthetic sample streams the multimodal plumbing produces)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import multimodal as ops_mm

# shared synthetic "sample stream": per-user-bucket centered
# integer samples ordered by event_id
_DSP_V = "(CAST(floor(value) AS BIGINT) - 245)"
_DSP_K = "(user_id % 6)"

# ---------------------------------------------------------------------------
# find_peaks — half_width 2, strict-left / plateau-earliest rule
# ---------------------------------------------------------------------------
_FP_HW = 2
_FP_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_DSP_K} AS k, event_id AS o, {_DSP_V} AS v
      FROM events
    ),
    sides AS (
      SELECT k, o, v,
             max(v) OVER (PARTITION BY k ORDER BY o ASC
               ROWS BETWEEN {_FP_HW} PRECEDING AND 1 PRECEDING)
               AS lmax,
             max(v) OVER (PARTITION BY k ORDER BY o ASC
               ROWS BETWEEN 1 FOLLOWING AND {_FP_HW} FOLLOWING)
               AS rmax
      FROM s
    )
    SELECT k, o, v FROM sides
    WHERE (lmax IS NULL OR v > lmax)
      AND (rmax IS NULL OR v >= rmax)
"""


@gate("find_peaks", _FP_SQL)
def q_find_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_DSP_K).alias("k"),
        F.col("event_id").alias("o"),
        F.expr(_DSP_V).alias("v"),
    )
    return ops_mm.find_peaks(
        ev, key="k", order="o", value="v", half_width=_FP_HW
    )


# ---------------------------------------------------------------------------
# zero_crossings — sign-change rate of the centered stream
# ---------------------------------------------------------------------------
_ZC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_DSP_K} AS k, event_id AS o, {_DSP_V} AS v
      FROM events
    ),
    sg AS (
      SELECT k, o,
             CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1
               ELSE NULL END AS sgn
      FROM s
    ),
    carried AS (
      SELECT k, o,
             last_value(sgn IGNORE NULLS) OVER (PARTITION BY k
               ORDER BY o ASC ROWS UNBOUNDED PRECEDING) AS s2
      FROM sg
    ),
    lagged AS (
      SELECT k, s2,
             lag(s2, 1) OVER (PARTITION BY k ORDER BY o ASC)
               AS p2
      FROM carried
    ),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN s2 IS NOT NULL AND p2 IS NOT NULL
               AND s2 * p2 < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_crossings
      FROM lagged GROUP BY k
    )
    SELECT k, n, n_crossings,
           CASE WHEN n > 1 THEN cast(n_crossings as double)
             / (cast(n as double) - 1.0e0) END AS zcr
    FROM agg
"""


@gate("zero_crossings", _ZC_SQL)
def q_zero_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_DSP_K).alias("k"),
        F.col("event_id").alias("o"),
        F.expr(_DSP_V).alias("v"),
    )
    return ops_mm.zero_crossings(ev, key="k", order="o", value="v")


# ---------------------------------------------------------------------------
# frame_energy — 64-sample frames of the centered stream
# ---------------------------------------------------------------------------
_FE_FR = 64
_FE_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_DSP_K} AS k, event_id AS o, {_DSP_V} AS v
      FROM events
    ),
    pos AS (
      SELECT k, v,
             CAST(row_number() OVER (PARTITION BY k
               ORDER BY o ASC) AS BIGINT) - 1 AS rn,
             CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS nk
      FROM s
    ),
    kept AS (
      SELECT k, v, rn FROM pos
      WHERE rn < (nk // {_FE_FR}) * {_FE_FR}
    ),
    agg AS (
      SELECT k, rn // {_FE_FR} AS frame_idx,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v * v) AS BIGINT) AS energy
      FROM kept GROUP BY k, rn // {_FE_FR}
    )
    SELECT k, CAST(frame_idx AS BIGINT) AS frame_idx, n, energy,
           sqrt(cast(energy as double) / {float(_FE_FR)!r}e0)
             AS rms
    FROM agg
"""


@gate("frame_energy", _FE_SQL)
def q_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_DSP_K).alias("k"),
        F.col("event_id").alias("o"),
        F.expr(_DSP_V).alias("v"),
    )
    return ops_mm.frame_energy(
        ev, key="k", order="o", value="v", frame=_FE_FR
    )
