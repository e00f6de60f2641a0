"""Gate registry extension 81 — Good-Turing count-of-counts
smoothing over the corpus unigram table (the classical unseen-mass
estimate p0 = N_1/N). Integer-exact: one truncating division per
count class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark.gate import _TOKS, _t, gate
from pdal_spark.operators.textops import GT_Q, good_turing


def _gt_sql() -> str:
    return f"""
    WITH wc AS MATERIALIZED (
      SELECT word, count(*) AS r FROM {_TOKS} t GROUP BY 1
    ),
    nr AS MATERIALIZED (
      SELECT r, count(*) AS n_r FROM wc GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(r) AS BIGINT) AS n_tokens FROM wc),
    n1t AS (
      SELECT CAST(coalesce(sum(n_r), 0) AS BIGINT) AS n1
      FROM nr WHERE r = 1
    ),
    led AS (
      SELECT r, n_r,
             lead(r) OVER (ORDER BY r ASC) AS rn,
             lead(n_r) OVER (ORDER BY r ASC) AS nn
      FROM nr
    )
    SELECT led.r, led.n_r,
           CASE WHEN led.rn = led.r + 1 THEN
             ((led.r + 1) * led.nn * CAST({GT_Q} AS BIGINT))
               // led.n_r END AS r_star_q,
           tot.n_tokens,
           (n1t.n1 * CAST({GT_Q} AS BIGINT)) // tot.n_tokens
             AS p0_q
    FROM led CROSS JOIN tot CROSS JOIN n1t
    """


@gate("good_turing", _gt_sql())
def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return good_turing(_t(spark, sf_dir, "documents"))

