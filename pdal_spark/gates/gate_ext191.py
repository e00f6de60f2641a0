"""Gate registry extension 191 — point-process batch: exponential
gap GOF and temporal Fano factor."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_EG_EV = f"(CASE WHEN {G.lehmer2('event_id')} % 23 = 0 THEN 1 ELSE 0 END)"
_EG_FEMP = "(cast(cf as double) / cast(n_gaps as double))"
_EG_FEXP = (
    "(1.0e0 - exp(-(cast(n_gaps as double)"
    " / cast(sum_gaps as double)) * cast(g as double)))"
)
_EG_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, {_EG_EV} AS ev FROM events
    ),
    pos AS MATERIALIZED (
      SELECT CAST(rn0 AS BIGINT) AS rn
      FROM (SELECT o, ev,
              row_number() OVER (ORDER BY o ASC) AS rn0
            FROM s) t
      WHERE ev = 1
    ),
    gaps AS (
      SELECT CAST(rn - lag(rn, 1) OVER (ORDER BY rn ASC)
               AS BIGINT) AS g
      FROM pos
      QUALIFY lag(rn, 1) OVER (ORDER BY rn ASC) IS NOT NULL
    ),
    per AS (
      SELECT g, CAST(count(*) AS BIGINT) AS c
      FROM gaps GROUP BY g
    ),
    cum AS (
      SELECT g,
             CAST(sum(c) OVER (ORDER BY g ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cf,
             CAST(sum(c) OVER () AS BIGINT) AS n_gaps,
             CAST(sum(g * c) OVER () AS BIGINT) AS sum_gaps
      FROM per
    )
    SELECT n_gaps, sum_gaps,
           round(max(abs({_EG_FEMP} - {_EG_FEXP})), 9) AS d_stat_r
    FROM cum GROUP BY n_gaps, sum_gaps
"""


@gate("exp_gof", _EG_SQL)
def q_exp_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr(_EG_EV).alias("ev"),
    )
    return ops_temporal.exp_gof(ev, order="o", event="ev")


_FF_W = 50
_FF_PRED = "event_id % 3 = 0"
_FF_FANO = (
    "((cast(n_bins as double) * cast(sum_c2 as double)"
    " - cast(t as double) * cast(t as double))"
    " / (cast(n_bins as double) * cast(t as double)))"
)
_FF_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT CAST(event_id AS BIGINT) AS o
      FROM events WHERE {_FF_PRED}
    ),
    ext AS (
      SELECT CAST(min(o) AS BIGINT) AS o0,
             CAST(max(o) AS BIGINT) AS o1,
             CAST(count(*) AS BIGINT) AS t
      FROM s
    ),
    bins AS (
      SELECT (o - o0) // {_FF_W} AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM s, ext GROUP BY (o - o0) // {_FF_W}
    ),
    mom AS (
      SELECT CAST(sum(c) AS BIGINT) AS t,
             CAST(sum(c * c) AS BIGINT) AS sum_c2
      FROM bins
    ),
    nb AS (
      SELECT CAST((o1 - o0) // {_FF_W} + 1 AS BIGINT) AS n_bins
      FROM ext
    )
    SELECT n_bins, t AS n_events, sum_c2,
           CASE WHEN t > 0 THEN {_FF_FANO} END AS fano
    FROM mom, nb
"""


@gate("fano_factor", _FF_SQL)
def q_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_FF_PRED).select(
        F.col("event_id").cast("long").alias("o")
    )
    return ops_temporal.fano_factor(ev, order="o",
                                    window_w=_FF_W)
