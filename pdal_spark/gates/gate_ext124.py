"""Gate registry extension 124 — spectral/SPC batch: DFT
periodogram and XmR control chart."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# periodogram — energy at harmonics 1..4 of a 24-step cycle over
# per-user sequences (value has a planted period-24 component:
# event_id % 24 enters v)
# ---------------------------------------------------------------------------
_PG_N = 24
_PG_FREQS = [1, 2, 3, 4]
_PG_QF = G.fnum(float(ops_temporal.PGRAM_Q))
_PG_2PI = G.fnum(2.0 * math.pi)
_PG_ANG = (
    f"({_PG_2PI} * cast(k as double) * cast(t as double)"
    f" / cast({_PG_N} as double))"
)
_PG_CQ = (
    f"cast(floor(round(cos({_PG_ANG}), 9) * {_PG_QF}"
    f" + {G.fnum(0.5)}) as bigint)"
)
_PG_SQ = (
    f"cast(floor(round(sin({_PG_ANG}), 9) * {_PG_QF}"
    f" + {G.fnum(0.5)}) as bigint)"
)
_PG_SQL = f"""
    WITH base AS MATERIALIZED (
      SELECT user_id % 17 AS kk, event_id AS o,
             event_id % 24 + event_id % 7 AS v
      FROM events
    ),
    pos AS (
      SELECT kk, v,
             row_number() OVER (PARTITION BY kk ORDER BY o) - 1 AS t
      FROM base
    ),
    e AS (
      SELECT kk, v, t, f.k AS k
      FROM pos, (VALUES (1), (2), (3), (4)) f(k)
    ),
    agg AS (
      SELECT kk, k,
             CAST(sum(v * ({_PG_CQ})) AS BIGINT) AS cq_sum,
             CAST(sum(v * ({_PG_SQ})) AS BIGINT) AS sq_sum
      FROM e GROUP BY kk, k
    )
    SELECT kk AS user_id, CAST(k AS BIGINT) AS k, cq_sum, sq_sum,
           (cast(cq_sum as double) / {_PG_QF})
             * (cast(cq_sum as double) / {_PG_QF})
           + (cast(sq_sum as double) / {_PG_QF})
             * (cast(sq_sum as double) / {_PG_QF}) AS power
    FROM agg
"""


@gate("periodogram", _PG_SQL)
def q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 17).alias("kk"),
        F.col("event_id").alias("o"),
        (F.col("event_id") % 24 + F.col("event_id") % 7).alias("v"),
    )
    out = ops_temporal.periodogram(
        ev, key="kk", order="o", value="v", freqs=_PG_FREQS,
        period_n=_PG_N,
    )
    return out.select(
        F.col("kk").alias("user_id"), "k", "cq_sum", "sq_sum",
        "power",
    )


# ---------------------------------------------------------------------------
# xmr_chart — process-behavior limits on a per-cohort residue stream
# ---------------------------------------------------------------------------
_XM_SQL = """
    WITH base AS MATERIALIZED (
      SELECT user_id % 23 AS kk, event_id AS o, event_id % 37 AS v,
             abs(event_id % 37 - lag(event_id % 37) OVER (
               PARTITION BY user_id % 23 ORDER BY event_id)) AS mr
      FROM events
    ),
    agg AS (
      SELECT kk, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS sv,
             CAST(sum(mr) AS BIGINT) AS smr,
             CAST(count(mr) AS BIGINT) AS n_mr
      FROM base GROUP BY kk HAVING count(mr) > 0
    )
    SELECT base.kk AS user_id, o AS event_id, CAST(v AS BIGINT) AS v,
           n,
           (cast(sv as double) / cast(n as double)) AS center,
           (cast(sv as double) / cast(n as double))
             + (2.66e0 * cast(smr as double) / cast(n_mr as double))
             AS unpl,
           (cast(sv as double) / cast(n as double))
             - (2.66e0 * cast(smr as double) / cast(n_mr as double))
             AS lnpl,
           cast(v as double) > (cast(sv as double)
             / cast(n as double))
             + (2.66e0 * cast(smr as double) / cast(n_mr as double))
           or cast(v as double) < (cast(sv as double)
             / cast(n as double))
             - (2.66e0 * cast(smr as double) / cast(n_mr as double))
             AS out_of_limits
    FROM base JOIN agg ON agg.kk = base.kk
"""


@gate("xmr_chart", _XM_SQL)
def q_xmr_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 23).alias("kk"),
        F.col("event_id").alias("o"),
        (F.col("event_id") % 37).alias("v"),
    )
    out = ops_temporal.xmr_chart(ev, key="kk", order="o", value="v")
    return out.select(
        F.col("kk").alias("user_id"),
        F.col("o").alias("event_id"),
        F.col("v").cast("long").alias("v"),
        "n", "center", "unpl", "lnpl", "out_of_limits",
    )
