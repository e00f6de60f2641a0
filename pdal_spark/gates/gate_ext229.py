"""Gate registry extension 229 — SRE batch: threshold crossing and
burn rate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_TC_TH = 2000
_TC_V = (
    "(CAST(floor(value) AS BIGINT)"
    " + (CAST(event_id AS BIGINT) % 10007) // 10)"
)
_TC_B = "(cast(num as double) / cast(den as double))"
_TC_A = (
    "(cast(sy as double) / cast(n as double)"
    f" - {_TC_B} * cast(sx as double) / cast(n as double))"
)
_TC_TC = (
    f"(({float(_TC_TH)!r}e0 - {_TC_A}) / {_TC_B}"
    " - cast(n as double))"
)
_TC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, {_TC_V} AS v FROM events
    ),
    base AS MATERIALIZED (
      SELECT v,
             CAST(row_number() OVER (ORDER BY o ASC) AS BIGINT)
               AS t
      FROM s
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t) AS BIGINT) AS sx,
             CAST(sum(v) AS BIGINT) AS sy,
             CAST(count(*) * sum(t * v) - sum(t) * sum(v)
               AS BIGINT) AS num,
             CAST(count(*) * sum(t * t) - sum(t) * sum(t)
               AS BIGINT) AS den
      FROM base
    )
    SELECT n, num, den,
           CASE WHEN den <> 0 THEN {_TC_B} END AS slope,
           CASE WHEN den <> 0 AND num <> 0 AND {_TC_TC} > 0.0e0
             THEN {_TC_TC} END AS t_cross
    FROM mom
""".replace("//", "//")


@gate("threshold_crossing", _TC_SQL)
def q_threshold_crossing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr(
            "cast(floor(value) as bigint)"
            " + (cast(event_id as bigint) % 10007) div 10"
        ).alias("v"),
    )
    return ops_temporal.threshold_crossing(
        ev, order="o", value="v", threshold=_TC_TH
    )


_BR_WS = [100, 1000]
_BR_BN, _BR_BD = 1, 100
_BR_E = f"(CASE WHEN {G.lehmer2('event_id')} % 50 = 0 THEN 1 ELSE 0 END)"
_BR_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST({_BR_E} AS BIGINT) AS e
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT e,
             CAST(row_number() OVER (ORDER BY o DESC) AS BIGINT)
               AS rn
      FROM s
    ),
    ladder AS (
      SELECT e, CAST(t.w AS BIGINT) AS w
      FROM base,
           (SELECT unnest([{", ".join(map(str, _BR_WS))}]) AS w) t
      WHERE rn <= t.w
    ),
    agg AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n_in,
             CAST(sum(e) AS BIGINT) AS n_errors
      FROM ladder GROUP BY w
    )
    SELECT w, n_errors,
           CASE WHEN n_in > 0 THEN cast(n_errors as double)
             * {float(_BR_BD)!r}e0
             / (cast(n_in as double) * {float(_BR_BN)!r}e0) END
             AS burn
    FROM agg
"""


@gate("burn_rate", _BR_SQL)
def q_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr(_BR_E.replace("CASE WHEN", "case when")
               .replace("THEN 1 ELSE 0 END", "then 1 else 0 end"))
        .cast("long").alias("e"),
    )
    return ops_temporal.burn_rate(
        ev, order="o", is_error="e", budget_num=_BR_BN,
        budget_den=_BR_BD, windows=_BR_WS,
    )
