"""Gate registry extension 63 — nonparametric two-sample tests:
exact-integer KS statistic and Mann-Whitney U (doubled rank sums)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark.gate import _t, gate

_NP_A = "user_id % 2 = 0"
_NP_B = "user_id % 2 = 1"


def _ks_sql() -> str:
    return f"""
    WITH u AS MATERIALIZED (
      SELECT value AS v,
             CASE WHEN {_NP_A} THEN 1 ELSE 0 END AS a,
             CASE WHEN {_NP_B} THEN 1 ELSE 0 END AS b
      FROM events
    ),
    per AS (
      SELECT v, CAST(sum(a) AS BIGINT) AS ca,
             CAST(sum(b) AS BIGINT) AS cb
      FROM u GROUP BY 1
    ),
    c AS (
      SELECT v,
             sum(ca) OVER (ORDER BY v ASC
                           ROWS UNBOUNDED PRECEDING) AS fa,
             sum(cb) OVER (ORDER BY v ASC
                           ROWS UNBOUNDED PRECEDING) AS fb,
             sum(ca) OVER () AS na, sum(cb) OVER () AS nb
      FROM per
    )
    SELECT v AS d_at, CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST(abs(fa * nb - fb * na) AS BIGINT) AS d_num
    FROM c
    ORDER BY abs(fa * nb - fb * na) DESC, v ASC
    LIMIT 1
    """


@gate("ks_test", _ks_sql())
def q_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.stats import ks_test

    ev = _t(spark, sf_dir, "events")
    return ks_test(ev.where(_NP_A), ev.where(_NP_B), "value")


def _mwu_sql() -> str:
    return f"""
    WITH u AS MATERIALIZED (
      SELECT value AS v,
             CASE WHEN {_NP_A} THEN 1 ELSE 0 END AS a,
             CASE WHEN {_NP_B} THEN 1 ELSE 0 END AS b
      FROM events
    ),
    per AS (
      SELECT v, CAST(sum(a) AS BIGINT) AS ca,
             CAST(sum(b) AS BIGINT) AS cb,
             CAST(sum(a) + sum(b) AS BIGINT) AS t
      FROM u GROUP BY 1
    ),
    c AS (
      SELECT *,
             sum(t) OVER (ORDER BY v ASC
                          ROWS UNBOUNDED PRECEDING) - t AS cprev
      FROM per
    ),
    agg AS (
      SELECT CAST(sum(ca) AS BIGINT) AS n_a,
             CAST(sum(cb) AS BIGINT) AS n_b,
             CAST(sum(ca * (2 * cprev + t + 1)) AS BIGINT)
               AS two_r_a
      FROM c
    )
    SELECT n_a, n_b, two_r_a,
           CAST(2 * n_a * n_b + n_a * (n_a + 1) - two_r_a
                AS BIGINT) AS two_u_a
    FROM agg
    """


@gate("mann_whitney_u", _mwu_sql())
def q_mwu(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.stats import mann_whitney_u

    ev = _t(spark, sf_dir, "events")
    return mann_whitney_u(ev.where(_NP_A), ev.where(_NP_B), "value")
