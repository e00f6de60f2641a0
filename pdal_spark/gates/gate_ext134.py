"""Gate registry extension 134 — privacy-measurement/corpus-growth
batch: Warner randomized response, Heaps' law fit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import textops as ops_text

# ---------------------------------------------------------------------------
# randomized_response — hash answers under the p = 3/4 protocol
# ---------------------------------------------------------------------------
_RRQ = ops_text.RR_Q
_RR_P_Q = (3 * _RRQ) // 4
_RR_ANS = f"(CASE WHEN {G.lehmer2('event_id')} % 10 < 4 THEN 1 ELSE 0 END)"
_RR_PF = f"(cast({_RR_P_Q} as double) / cast({_RRQ} as double))"
_RR_SQL = f"""
    WITH agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_RR_ANS}) AS BIGINT) AS yes
      FROM events
    )
    SELECT n, yes,
           ((cast(yes as double) / cast(n as double)) + {_RR_PF}
            - 1.0e0) / (2.0e0 * {_RR_PF} - 1.0e0) AS pi_hat,
           (cast(yes as double) / cast(n as double))
             * (1.0e0 - cast(yes as double) / cast(n as double))
             / (cast(n as double) * (2.0e0 * {_RR_PF} - 1.0e0)
                * (2.0e0 * {_RR_PF} - 1.0e0)) AS var_hat
    FROM agg
"""


@gate("randomized_response", _RR_SQL)
def q_randomized_response(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_RR_ANS).alias("answer")
    )
    return ops_text.randomized_response_estimate(
        ev, p_honest_q=_RR_P_Q
    )


# ---------------------------------------------------------------------------
# heaps_law — vocabulary growth over the documents token table
# ---------------------------------------------------------------------------
_HP_CPS = [2, 4, 8, 16, 32, 64, 128, 256]
_HP_QF = G.fnum(float(ops_text.HEAPS_Q))


def _heaps_sql() -> str:
    vs = ",\n             ".join(
        f"CAST(count(DISTINCT CASE WHEN doc_id <= {t} THEN w END)"
        f" AS BIGINT) AS v{i}"
        for i, t in enumerate(_HP_CPS)
    )
    unions = "\nUNION ALL\n".join(
        f"SELECT {t} AS t, v{i} AS v FROM m"
        for i, t in enumerate(_HP_CPS)
    )
    lnq = (
        "cast(floor(ln(cast({c} as double)) * " + _HP_QF
        + f" + {G.fnum(0.5)}) as bigint)"
    )
    beta = (
        "((cast(n as double) * cast(sxy as double)"
        " - cast(sx as double) * cast(sy as double))"
        " / (cast(n as double) * cast(sxx as double)"
        " - cast(sx as double) * cast(sx as double)))"
    )
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    m AS (
      SELECT {vs}
      FROM toks
    ),
    pairs AS ({unions}),
    r AS (
      SELECT {lnq.format(c='t')} AS x, {lnq.format(c='v')} AS y
      FROM pairs WHERE v > 0
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM r
    )
    SELECT n AS n_checkpoints,
           case when n >= 2 and n * sxx - sx * sx <> 0 then
             round({beta}, 9) end AS beta,
           case when n >= 2 and n * sxx - sx * sx <> 0 then
             round((cast(sy as double) - {beta}
               * cast(sx as double))
               / cast(n as double) / {_HP_QF}, 9) end AS ln_k
    FROM mom
    """


@gate("heaps_law", _heaps_sql())
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.col("text"), " ")).alias("word"),
    )
    return ops_text.heaps_law(
        toks, doc_id="doc_id", word="word", checkpoints=_HP_CPS
    )
