"""Gate registry extension 75 — windowed skip-gram co-occurrence
with PPMI weighting (Levy & Goldberg 2014's SGNS-equivalent count
matrix). Pairs from `window` lead() offsets per document,
symmetrized (least, greatest); marginals from the pair table; the
lnq discipline keeps every compared value an exact integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark import sqlgen as G
from pdal_spark.gate import _TOKS, _t, gate
from pdal_spark.operators.textops import PMI_Q, ppmi_cooc

_PP_W = 3
_PP_MIN = 3
_PP_K = 60


def _ppmi_sql() -> str:
    q = G.fnum(float(PMI_Q))
    half = G.fnum(0.5)
    # filter the lead BEFORE least/greatest: both engines' least()
    # SKIPS nulls (least(x, NULL) = x), so a post-hoc null filter
    # would silently keep end-of-document self-pairs
    leads = "\n        UNION ALL ".join(
        f"""SELECT least(word, nx) AS a, greatest(word, nx) AS b
        FROM (SELECT word, lead(word, {k}) OVER
          (PARTITION BY doc_id ORDER BY pos) AS nx FROM tk) x{k}
        WHERE nx IS NOT NULL"""
        for k in range(1, _PP_W + 1)
    )
    return f"""
    WITH tk AS MATERIALIZED (
      SELECT doc_id, pos, word FROM {_TOKS} t
    ),
    pairs AS MATERIALIZED (
      SELECT a, b FROM ({leads}) u
    ),
    cab AS MATERIALIZED (
      SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY 1, 2
    ),
    ca AS MATERIALIZED (
      SELECT w, CAST(sum(c_ab) AS BIGINT) AS c_w FROM (
        SELECT a AS w, c_ab FROM cab
        UNION ALL SELECT b, c_ab FROM cab
      ) m GROUP BY 1
    ),
    nt AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_t FROM cab),
    scored AS (
      SELECT cab.a, cab.b, cab.c_ab,
             greatest(CAST(0 AS BIGINT),
               CAST(floor(ln(CAST(cab.c_ab * nt.n_t AS DOUBLE))
                    * {q} + {half}) AS BIGINT)
               - CAST(floor(ln(CAST(wa.c_w * wb.c_w AS DOUBLE))
                    * {q} + {half}) AS BIGINT)) AS ppmi_q
      FROM cab
      JOIN ca wa ON wa.w = cab.a
      JOIN ca wb ON wb.w = cab.b
      CROSS JOIN nt
      WHERE cab.c_ab >= {_PP_MIN}
    )
    SELECT a, b, c_ab, ppmi_q,
           CAST(row_number() OVER (
             ORDER BY ppmi_q DESC, a ASC, b ASC) AS INT) AS rank
    FROM scored ORDER BY ppmi_q DESC, a ASC, b ASC LIMIT {_PP_K}
    """


@gate("ppmi_cooc", _ppmi_sql())
def q_ppmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ppmi_cooc(
        _t(spark, sf_dir, "documents"),
        window=_PP_W, min_count=_PP_MIN, top_k=_PP_K,
    )

