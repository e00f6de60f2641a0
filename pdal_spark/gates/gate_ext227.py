"""Gate registry extension 227 — heterogeneity batch: interaction
contrast and cap sensitivity."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_IC_S = "(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)"
_IC_G = f"(CASE WHEN {G.lehmer2('event_id')} % 2 = 0 THEN 1 ELSE 0 END)"
_IC_Y = (
    f"(CASE WHEN {G.lehmer2('event_id * 3 + 1')} % 10"
    f" < 2 + 3 * ({_IC_G}) * ({_IC_S}) THEN 1 ELSE 0 END)"
)


def _ic_p(s: int, g: int) -> str:
    return f"(cast(x{s}{g} as double) / cast(n{s}{g} as double))"


def _ic_var(s: int, g: int) -> str:
    pp = _ic_p(s, g)
    return f"({pp} * (1.0e0 - {pp}) / cast(n{s}{g} as double))"


_IC_DA = f"({_ic_p(0, 1)} - {_ic_p(0, 0)})"
_IC_DB = f"({_ic_p(1, 1)} - {_ic_p(1, 0)})"
_IC_SE = (
    f"sqrt({_ic_var(0, 1)} + {_ic_var(0, 0)}"
    f" + {_ic_var(1, 1)} + {_ic_var(1, 0)})"
)
_IC_GUARD = " AND ".join(
    f"n{s}{g} > 0" for s in (0, 1) for g in (0, 1)
)
_IC_CELLS = ",\n        ".join(
    f"CAST(sum(CASE WHEN s = {s} AND g = {g} THEN 1 ELSE 0 END)"
    f" AS BIGINT) AS n{s}{g},\n        "
    f"CAST(sum(CASE WHEN s = {s} AND g = {g} THEN y ELSE 0 END)"
    f" AS BIGINT) AS x{s}{g}"
    for s in (0, 1) for g in (0, 1)
)
_IC_SQL = f"""
    WITH s0 AS MATERIALIZED (
      SELECT {_IC_S} AS s, {_IC_G} AS g, {_IC_Y} AS y
      FROM events
    ),
    agg AS (
      SELECT
        {_IC_CELLS}
      FROM s0
    )
    SELECT CAST(n00 + n01 + n10 + n11 AS BIGINT) AS n,
           CASE WHEN {_IC_GUARD} THEN {_IC_DA} END AS d_a,
           CASE WHEN {_IC_GUARD} THEN {_IC_DB} END AS d_b,
           CASE WHEN {_IC_GUARD} AND {_IC_SE} > 0.0e0 THEN
             ({_IC_DA} - {_IC_DB}) / {_IC_SE} END AS z
    FROM agg
"""


@gate("interaction_contrast", _IC_SQL)
def q_interaction_contrast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_IC_S).alias("s"), F.expr(_IC_G).alias("g"),
        F.expr(_IC_Y).alias("y"),
    )
    return ops_stats.interaction_contrast(
        ev, segment="s", arm="g", success="y"
    )


_CS_CAPS = [100, 250, 400]
_CS_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT CAST(floor(value) AS BIGINT) AS v FROM events
    ),
    ladder AS (
      SELECT v, CAST(t.cap AS BIGINT) AS cap
      FROM s, (SELECT unnest([{", ".join(map(str, _CS_CAPS))}])
                 AS cap) t
    )
    SELECT cap, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN v > cap THEN 1 ELSE 0 END)
             AS BIGINT) AS n_capped,
           cast(sum(least(v, cap)) as double)
             / cast(count(*) as double) AS capped_mean,
           cast(sum(CASE WHEN v > cap THEN 1 ELSE 0 END)
             as double) / cast(count(*) as double)
             AS capped_share
    FROM ladder GROUP BY cap
"""


@gate("cap_sensitivity", _CS_SQL)
def q_cap_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(floor(value) as bigint)").alias("v")
    )
    return ops_stats.cap_sensitivity(
        ev, value="v", caps=_CS_CAPS
    )
