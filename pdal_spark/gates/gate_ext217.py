"""Gate registry extension 217 — DSP-QA batch: crest factor and
energy flatness."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import multimodal as ops_mm

_CF_V = "(CAST(floor(value) AS BIGINT) - 245)"
_CF_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 6 AS k, {_CF_V} AS v FROM events
    )
    SELECT k, CAST(count(*) AS BIGINT) AS n,
           CAST(max(abs(v)) AS BIGINT) AS peak_abs,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CASE WHEN sum(v * v) > 0 THEN
             cast(max(abs(v)) as double)
             / sqrt(cast(sum(v * v) as double)
             / cast(count(*) as double)) END AS crest
    FROM s GROUP BY k
"""


@gate("crest_factor", _CF_SQL)
def q_crest_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 6).alias("k"),
        (F.expr("cast(floor(value) as bigint)") - 245).alias("v"),
    )
    return ops_mm.crest_factor(ev, key="k", value="v")


_EF_Q = float(ops_mm.EFLAT_Q)
_EF_FR = 64
_EF_GM = (
    f"exp(cast(lq as double)"
    f" / (cast(n_frames as double) * {_EF_Q!r}e0))"
)
_EF_MEAN = "(cast(e_sum as double) / cast(n_frames as double))"
_EF_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 6 AS k, event_id AS o, {_CF_V} AS v
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
      WHERE rn < (nk // {_EF_FR}) * {_EF_FR}
    ),
    frames AS (
      SELECT k, rn // {_EF_FR} AS fi,
             greatest(CAST(sum(v * v) AS BIGINT), 1) AS e
      FROM kept GROUP BY k, rn // {_EF_FR}
    ),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_frames,
             CAST(sum(e) AS BIGINT) AS e_sum,
             CAST(sum(cast(floor(ln(cast(e as double))
               * {_EF_Q!r}e0 + 0.5e0) as bigint)) AS BIGINT)
               AS lq
      FROM frames GROUP BY k
    )
    SELECT k, n_frames, e_sum,
           CASE WHEN n_frames > 0 AND {_EF_MEAN} > 0.0e0 THEN
             round({_EF_GM} / {_EF_MEAN}, 9) END AS flat_r
    FROM agg
"""


@gate("energy_flatness", _EF_SQL)
def q_energy_flatness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 6).alias("k"),
        F.col("event_id").alias("o"),
        (F.expr("cast(floor(value) as bigint)") - 245).alias("v"),
    )
    return ops_mm.energy_flatness(
        ev, key="k", order="o", value="v", frame=_EF_FR
    )
