"""Gate registry extension 69 — interpolated Kneser-Ney bigram LM
over the documents corpus. Every statistic is an integer count over
the bigram-type table; the probability is ONE truncating division
of non-negative int64 products (D = 3/4 exact in quarters), so the
oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark.gate import _TOKS, _t, gate
from pdal_spark.operators.textops import KN_Q, kneser_ney_bigram

_KN_MIN = 2  # output filter only; stats use the full bigram table


def _kn_sql() -> str:
    return f"""
    WITH tk AS MATERIALIZED (
      SELECT doc_id, pos, word FROM {_TOKS} t
    ),
    bg AS MATERIALIZED (
      SELECT w1, w2, count(*) AS c12 FROM (
        SELECT word AS w1,
               lead(word) OVER (PARTITION BY doc_id ORDER BY pos)
                 AS w2
        FROM tk) x WHERE w2 IS NOT NULL GROUP BY 1, 2
    ),
    lft AS (
      SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
             count(*) AS n1w1
      FROM bg GROUP BY 1
    ),
    cont AS (SELECT w2, count(*) AS ncont FROM bg GROUP BY 1),
    tot AS (SELECT count(*) AS ntot FROM bg)
    SELECT bg.w1, bg.w2, bg.c12, lft.c1, lft.n1w1, cont.ncont,
           tot.ntot,
           (CAST({KN_Q} AS BIGINT) * (4 * bg.c12 - 3) * tot.ntot
            + CAST({KN_Q} AS BIGINT) * 3 * lft.n1w1 * cont.ncont)
             // (4 * lft.c1 * tot.ntot) AS pkn_q
    FROM bg
    JOIN lft ON lft.w1 = bg.w1
    JOIN cont ON cont.w2 = bg.w2
    CROSS JOIN tot
    WHERE bg.c12 >= {_KN_MIN}
    """


@gate("kneser_ney", _kn_sql())
def q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kneser_ney_bigram(
        _t(spark, sf_dir, "documents"), min_count=_KN_MIN
    )

