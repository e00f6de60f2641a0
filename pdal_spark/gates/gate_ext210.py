"""Gate registry extension 210 — two-sample batch: energy distance
and Cramér-von Mises."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_ED_A = "event_id % 31 = 0"
_ED_B = "event_id % 31 = 7"
_ED_E = (
    "(2.0e0 * cast(sxy as double)"
    " / (cast(n_a as double) * cast(n_b as double))"
    " - cast(sxx as double)"
    " / (cast(n_a as double) * cast(n_a as double))"
    " - cast(syy as double)"
    " / (cast(n_b as double) * cast(n_b as double)))"
)
_ED_SQL = f"""
    WITH a AS MATERIALIZED (
      SELECT CAST(floor(value) AS BIGINT) AS xa
      FROM events WHERE {_ED_A}
    ),
    b AS MATERIALIZED (
      SELECT CAST(floor(value) AS BIGINT) AS xb
      FROM events WHERE {_ED_B}
    ),
    sxy AS (SELECT CAST(sum(abs(xa - xb)) AS BIGINT) AS sxy
            FROM a CROSS JOIN b),
    sxx AS (SELECT CAST(sum(abs(a1.xa - a2.xa)) AS BIGINT) AS sxx
            FROM a a1 CROSS JOIN a a2),
    syy AS (SELECT CAST(sum(abs(b1.xb - b2.xb)) AS BIGINT) AS syy
            FROM b b1 CROSS JOIN b b2),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM a),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM b)
    SELECT n_a, n_b, sxy, sxx, syy,
           CASE WHEN n_a > 0 AND n_b > 0 THEN {_ED_E} END
             AS e_dist
    FROM sxy, sxx, syy, na, nb
"""


@gate("energy_distance", _ED_SQL)
def q_energy_distance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.where(_ED_A).select(
        F.expr("cast(floor(value) as bigint)").alias("v")
    )
    b = ev.where(_ED_B).select(
        F.expr("cast(floor(value) as bigint)").alias("v")
    )
    return ops_stats.energy_distance(a, b, value="v")


_CM_A = "user_id % 2 = 0"
_CM_B = "user_id % 2 = 1"


def _cm_blk(cnt: str, prev: str) -> str:
    si = f"(({cnt}) * ({prev}) + (({cnt}) * (({cnt}) + 1)) // 2)"
    si2 = (
        f"(({cnt}) * ({prev}) * ({prev})"
        f" + 2 * ({prev}) * ((({cnt}) * (({cnt}) + 1)) // 2)"
        f" + ((({cnt}) * (({cnt}) + 1) * (2 * ({cnt}) + 1)) // 6))"
    )
    return f"(({cnt}) * r2 * r2 - 4 * r2 * {si} + 4 * {si2})"


_CM_T = (
    "((cast(n_a as double) * cast(sa4 as double)"
    " + cast(n_b as double) * cast(sb4 as double)) / 4.0e0"
    " / (cast(n_a as double) * cast(n_b as double)"
    " * (cast(n_a as double) + cast(n_b as double)))"
    " - (4.0e0 * cast(n_a as double) * cast(n_b as double)"
    " - 1.0e0)"
    " / (6.0e0 * (cast(n_a as double) + cast(n_b as double))))"
)
_CM_SQL = f"""
    WITH u AS MATERIALIZED (
      SELECT value AS v,
             CASE WHEN {_CM_A} THEN 0 ELSE 1 END AS g
      FROM events
    ),
    per AS (
      SELECT v, CAST(count(*) AS BIGINT) AS t,
             CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS ca
      FROM u GROUP BY v
    ),
    ranked AS (
      SELECT v, t, ca,
             CAST(2 * (sum(t) OVER (ORDER BY v ASC
               ROWS UNBOUNDED PRECEDING) - t) + t + 1 AS BIGINT)
               AS r2
      FROM per
    ),
    pos AS (
      SELECT *,
             CAST(sum(ca) OVER (ORDER BY v ASC
               ROWS UNBOUNDED PRECEDING) - ca AS BIGINT)
               AS pa_prev,
             CAST(sum(t - ca) OVER (ORDER BY v ASC
               ROWS UNBOUNDED PRECEDING) - (t - ca) AS BIGINT)
               AS pb_prev
      FROM ranked
    ),
    terms AS (
      SELECT {_cm_blk('ca', 'pa_prev')} AS ta,
             {_cm_blk('(t - ca)', 'pb_prev')} AS tb
      FROM pos
    ),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n_a
           FROM u WHERE g = 0),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b
           FROM u WHERE g = 1),
    agg AS (
      SELECT CAST(sum(ta) AS BIGINT) AS sa4,
             CAST(sum(tb) AS BIGINT) AS sb4
      FROM terms
    )
    SELECT n_a, n_b,
           CAST(n_a * sa4 + n_b * sb4 AS BIGINT) AS u4,
           CASE WHEN n_a > 0 AND n_b > 0 THEN {_CM_T} END
             AS t_stat
    FROM agg, na, nb
"""


@gate("cramer_von_mises", _CM_SQL)
def q_cramer_von_mises(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.where(_CM_A).select(F.col("value").alias("v"))
    b = ev.where(_CM_B).select(F.col("value").alias("v"))
    return ops_stats.cramer_von_mises(a, b, value="v")
