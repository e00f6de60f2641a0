"""Gate registry extension 57 — evaluation/monitoring batch:
rank-biased overlap between two rankings and Wilson score
intervals per group."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate

# ---------------------------------------------------------------------------
# rbo_topk — two deterministic hash rankings over a (query, doc)
# grid; the contribution table is Python-precomputed integers, so
# both engines sum identical values.
# ---------------------------------------------------------------------------

_RBO_K, _RBO_P = 10, 0.9
_RBO_HA = f"(d * 48271 + q * 7) % {G.M31}"
_RBO_HB = f"(d * 16807 + q * 11) % {G.M31}"


def _rbo_sql() -> str:
    import math

    from pdal_spark.operators.similarity import RBO_Q

    suf = [0.0] * (_RBO_K + 2)
    for m in range(_RBO_K, 0, -1):
        suf[m] = suf[m + 1] + (_RBO_P ** (m - 1)) / m
    lits = ", ".join(
        str(int(math.floor(s * RBO_Q + 0.5)))
        for s in suf[1:_RBO_K + 1]
    )
    return f"""
    WITH g AS MATERIALIZED (
      SELECT DISTINCT o_orderkey % 17 AS q, o_custkey % 43 AS d
      FROM orders
    ),
    ra AS (
      SELECT q, d, row_number() OVER (
               PARTITION BY q ORDER BY {_RBO_HA}, d) AS r
      FROM g
    ),
    rb AS (
      SELECT q, d, row_number() OVER (
               PARTITION BY q ORDER BY {_RBO_HB}, d) AS r
      FROM g
    ),
    j AS (
      SELECT ra.q, greatest(ra.r, rb.r) AS m
      FROM ra JOIN rb ON ra.q = rb.q AND ra.d = rb.d
      WHERE ra.r <= {_RBO_K} AND rb.r <= {_RBO_K}
    )
    SELECT q, count(*) AS n_common,
           CAST(sum(list_extract([{lits}], CAST(m AS INT)))
                AS BIGINT) AS rbo_q
    FROM j GROUP BY 1
    """


@gate("rbo_topk", _rbo_sql())
def q_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.similarity import rbo_overlap

    g = _t(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 17).alias("q"),
        (F.col("o_custkey") % 43).alias("d"),
    ).distinct()

    def ranked(h):
        w = Window.partitionBy("q").orderBy(
            F.expr(h), F.col("d").asc()
        )
        return g.withColumn("rank", F.row_number().over(w))

    return rbo_overlap(
        ranked(_RBO_HA), ranked(_RBO_HB),
        k=_RBO_K, p=_RBO_P, query_id="q", doc_id="d",
    )


# ---------------------------------------------------------------------------
# wilson_interval — 95% rate CI per event_type; the center/half
# chains are ONE shared string (stats.wilson_exprs).
# ---------------------------------------------------------------------------

_WI_PRED = "value > 100"


def _wilson_sql() -> str:
    from pdal_spark.operators.stats import wilson_exprs

    center, half = wilson_exprs()
    return f"""
    WITH a AS (
      SELECT event_type,
             CAST(sum(CASE WHEN {_WI_PRED} THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT event_type, x, n,
           round({center} - {half}, 9) AS lo,
           round({center} + {half}, 9) AS hi
    FROM a
    """


@gate("wilson_interval", _wilson_sql())
def q_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.stats import wilson_interval

    return wilson_interval(
        _t(spark, sf_dir, "events"), "event_type", _WI_PRED
    )
