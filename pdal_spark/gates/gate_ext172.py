"""Gate registry extension 172 — distribution-drift batch:
Hellinger distance and Jensen-Shannon divergence."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_DD_A = "user_id % 2 = 0"
_DD_B = "user_id % 2 = 1"
_DD_CAT = "CAST(floor(value / 40) AS BIGINT)"
_DD_CAT_SP = "cast(floor(value / 40) as bigint)"

_HL_Q = float(ops_stats.HELL_Q)
_HL_TERM = (
    "sqrt(cast(ca as double) * cast(cb as double))"
    " / sqrt(cast(n_a as double) * cast(n_b as double))"
)
_HL_SQL = f"""
    WITH a AS MATERIALIZED (
      SELECT {_DD_CAT} AS c, CAST(count(*) AS BIGINT) AS ca
      FROM events WHERE {_DD_A} GROUP BY 1
    ),
    b AS MATERIALIZED (
      SELECT {_DD_CAT} AS c, CAST(count(*) AS BIGINT) AS cb
      FROM events WHERE {_DD_B} GROUP BY 1
    ),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n_a
           FROM events WHERE {_DD_A}),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b
           FROM events WHERE {_DD_B}),
    j AS (
      SELECT coalesce(a.ca, 0) AS ca, coalesce(b.cb, 0) AS cb,
             n_a, n_b
      FROM a FULL OUTER JOIN b ON a.c = b.c, na, nb
    ),
    agg AS (
      SELECT n_a, n_b,
             CAST(sum(cast(floor({_HL_TERM} * {_HL_Q!r}e0
               + 0.5e0) as bigint)) AS BIGINT) AS bc_q_sum
      FROM j GROUP BY n_a, n_b
    )
    SELECT n_a, n_b, bc_q_sum,
           (cast(bc_q_sum as double) / {_HL_Q!r}e0) AS bc,
           round(sqrt(greatest(1.0e0
             - (cast(bc_q_sum as double) / {_HL_Q!r}e0),
             0.0e0)), 9) AS hellinger_r
    FROM agg
"""


@gate("hellinger_distance", _HL_SQL)
def q_hellinger_distance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.where(_DD_A).select(F.expr(_DD_CAT_SP).alias("c"))
    b = ev.where(_DD_B).select(F.expr(_DD_CAT_SP).alias("c"))
    return ops_stats.hellinger_distance(a, b, category="c")


_JS_Q = float(ops_stats.JS_LN_Q)
_JS_LP = (
    "cast(floor(ln(2.0e0 * cast(ca as double)"
    " * cast(n_b as double)"
    " / (cast(ca as double) * cast(n_b as double)"
    " + cast(cb as double) * cast(n_a as double)))"
    f" * {_JS_Q!r}e0 + 0.5e0) as bigint)"
)
_JS_LQ = (
    "cast(floor(ln(2.0e0 * cast(cb as double)"
    " * cast(n_a as double)"
    " / (cast(ca as double) * cast(n_b as double)"
    " + cast(cb as double) * cast(n_a as double)))"
    f" * {_JS_Q!r}e0 + 0.5e0) as bigint)"
)
_JS_SQL = f"""
    WITH a AS MATERIALIZED (
      SELECT {_DD_CAT} AS c, CAST(count(*) AS BIGINT) AS ca
      FROM events WHERE {_DD_A} GROUP BY 1
    ),
    b AS MATERIALIZED (
      SELECT {_DD_CAT} AS c, CAST(count(*) AS BIGINT) AS cb
      FROM events WHERE {_DD_B} GROUP BY 1
    ),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n_a
           FROM events WHERE {_DD_A}),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b
           FROM events WHERE {_DD_B}),
    j AS (
      SELECT coalesce(a.ca, 0) AS ca, coalesce(b.cb, 0) AS cb,
             n_a, n_b
      FROM a FULL OUTER JOIN b ON a.c = b.c, na, nb
    ),
    terms AS (
      SELECT n_a, n_b,
             CASE WHEN ca > 0 THEN ca * ({_JS_LP})
               ELSE CAST(0 AS BIGINT) END AS ta,
             CASE WHEN cb > 0 THEN cb * ({_JS_LQ})
               ELSE CAST(0 AS BIGINT) END AS tb
      FROM j
    ),
    agg AS (
      SELECT n_a, n_b, CAST(sum(ta) AS BIGINT) AS sa,
             CAST(sum(tb) AS BIGINT) AS sb
      FROM terms GROUP BY n_a, n_b
    )
    SELECT n_a, n_b, sa, sb,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
             (0.5e0 * cast(sa as double)
             / (cast(n_a as double) * {_JS_Q!r}e0)
             + 0.5e0 * cast(sb as double)
             / (cast(n_b as double) * {_JS_Q!r}e0)) END AS js
    FROM agg
"""


@gate("jensen_shannon", _JS_SQL)
def q_jensen_shannon(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.where(_DD_A).select(F.expr(_DD_CAT_SP).alias("c"))
    b = ev.where(_DD_B).select(F.expr(_DD_CAT_SP).alias("c"))
    return ops_stats.jensen_shannon(a, b, category="c")
