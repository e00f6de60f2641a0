"""Gate registry extension 202 — spatial-interaction batch:
distance-decay exponent and Hansen accessibility."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# synthetic OD flows with a planted decay: f ~ K / d2 (+ hash jitter)
_DD_Q = float(ops_stats.DD_Q)
_DD_D2 = f"(1 + CAST({G.lehmer2('event_id')} % 400 AS BIGINT))"
_DD_F = (
    f"(1 + 40000 // {_DD_D2}"
    f" + CAST({G.lehmer2('event_id * 3 + 1')} % 3 AS BIGINT))"
)
_DD_F_SP = (
    f"(1 + 40000 div {_DD_D2}"
    f" + cast({G.lehmer2('event_id * 3 + 1')} % 3 as bigint))"
)
_DD_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_DD_F} AS f, {_DD_D2} AS dd
      FROM events WHERE event_id % 11 = 0
    ),
    pts AS (
      SELECT CAST(floor(ln(cast(dd as double))
               * {_DD_Q!r}e0 + 0.5e0) AS BIGINT) AS x_q,
             CAST(floor(ln(cast(f as double))
               * {_DD_Q!r}e0 + 0.5e0) AS BIGINT) AS y_q
      FROM s WHERE f >= 1 AND dd >= 1
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(x_q) AS BIGINT) AS sx,
             CAST(sum(y_q) AS BIGINT) AS sy,
             CAST(sum(x_q * y_q) AS BIGINT) AS sxy,
             CAST(sum(x_q * x_q) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT n_pairs,
           CAST(n_pairs * sxy - sx * sy AS BIGINT) AS num,
           CAST(n_pairs * sxx - sx * sx AS BIGINT) AS den,
           CASE WHEN n_pairs * sxx - sx * sx <> 0 THEN
             -2.0e0 * cast(n_pairs * sxy - sx * sy as double)
             / cast(n_pairs * sxx - sx * sx as double) END
             AS beta
    FROM mom
"""


@gate("distance_decay", _DD_SQL)
def q_distance_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where("event_id % 11 = 0") \
        .select(
            F.expr(_DD_F_SP).alias("f"),
            F.expr(
                f"1 + cast({G.lehmer2('event_id')} % 400"
                " as bigint)"
            ).alias("dd"),
        )
    return ops_stats.distance_decay(ev, flow="f", d2="dd")


_HA_Q = ops_stats.HAN_Q
_HA_DEM = "event_id % 43 = 0"
_HA_SUP = "event_id % 311 = 7"
_HA_X = f"CAST({G.lehmer2('event_id')} % 1000 AS BIGINT)"
_HA_Y = f"CAST({G.lehmer2('event_id * 7 + 2')} % 1000 AS BIGINT)"
_HA_W = "(1 + user_id % 20)"
_HA_SQL = f"""
    WITH d AS MATERIALIZED (
      SELECT event_id AS i, {_HA_X} AS dx, {_HA_Y} AS dy
      FROM events WHERE {_HA_DEM}
    ),
    s AS MATERIALIZED (
      SELECT {_HA_X} AS sx2, {_HA_Y} AS sy2,
             CAST({_HA_W} AS BIGINT) AS o
      FROM events WHERE {_HA_SUP}
    ),
    pairs AS (
      SELECT i,
             (o * CAST({_HA_Q} AS BIGINT))
               // greatest((dx - sx2) * (dx - sx2)
               + (dy - sy2) * (dy - sy2), 1) AS t
      FROM d CROSS JOIN s
    )
    SELECT i, CAST(count(*) AS BIGINT) AS n_supply,
           CAST(sum(t) AS BIGINT) AS a_q,
           cast(sum(t) as double) / {float(_HA_Q)!r}e0 AS access
    FROM pairs GROUP BY i
"""


@gate("hansen_access", _HA_SQL)
def q_hansen_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = ev.where(_HA_DEM).select(
        F.col("event_id").alias("i"),
        F.expr(f"cast({G.lehmer2('event_id')} % 1000 as bigint)")
        .alias("x"),
        F.expr(
            f"cast({G.lehmer2('event_id * 7 + 2')} % 1000"
            " as bigint)"
        ).alias("y"),
    )
    s = ev.where(_HA_SUP).select(
        F.expr(f"cast({G.lehmer2('event_id')} % 1000 as bigint)")
        .alias("x"),
        F.expr(
            f"cast({G.lehmer2('event_id * 7 + 2')} % 1000"
            " as bigint)"
        ).alias("y"),
        F.expr(_HA_W).cast("long").alias("w"),
    )
    return ops_stats.hansen_access(
        d, s, id_demand="i", x="x", y="y", weight="w"
    )
