"""Gate registry extension 59 — time-series batch: fixed-point EWMA
(recursive-CTE oracle over the same integer recurrence) and exact
rolling lower median."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate

# ---------------------------------------------------------------------------
# ewma_smooth — alpha = 2/10 over per-user event values; the oracle
# replays the integer recurrence with a recursive CTE marching all
# keys in rank lockstep (bounded fixture: event_id % 20 = 0 keeps
# the recursion depth ~n/1000).
# ---------------------------------------------------------------------------

_EW_NUM, _EW_DEN = 2, 10


def _ewma_sql() -> str:
    from pdal_spark.operators.temporal import EWMA_Q

    q, nm, dn = EWMA_Q, _EW_NUM, _EW_DEN
    return f"""
    WITH RECURSIVE base AS MATERIALIZED (
      SELECT user_id % 50 AS key, event_id AS ord,
             CAST(floor(value * {q} + 0.5e0) AS BIGINT) AS v_q,
             row_number() OVER (
               PARTITION BY user_id % 50 ORDER BY event_id
             ) AS r
      FROM events WHERE event_id % 20 = 0
    ),
    rec AS (
      SELECT key, ord, v_q, r, v_q AS s FROM base WHERE r = 1
      UNION ALL
      SELECT b.key, b.ord, b.v_q, b.r,
             ({nm} * b.v_q + {dn - nm} * rec.s) // {dn} AS s
      FROM base b JOIN rec
        ON b.key = rec.key AND b.r = rec.r + 1
    )
    SELECT key, ord, v_q AS value_q, CAST(s AS BIGINT) AS ewma_q
    FROM rec
    """


@gate("ewma_smooth", _ewma_sql())
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.temporal import ewma_smooth

    ev = _t(spark, sf_dir, "events").where("event_id % 20 = 0")
    return ewma_smooth(
        ev.select((F.col("user_id") % 50).alias("k"),
                  "event_id", "value"),
        key="k", order_col="event_id", value="value",
        num=_EW_NUM, den=_EW_DEN,
    )


# ---------------------------------------------------------------------------
# rolling_median — trailing-7 lower median of event values per type.
# ---------------------------------------------------------------------------

_RM_W = 7


def _rolling_median_sql() -> str:
    w = _RM_W
    return f"""
    SELECT event_type, event_id, value,
           list_extract(
             list_sort(list(value) OVER (
               PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)),
             CAST((len(list(value) OVER (
               PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW))
               + 1) // 2 AS INT)
           ) AS med
    FROM events
    """


@gate("rolling_median", _rolling_median_sql())
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.temporal import rolling_median

    return rolling_median(
        _t(spark, sf_dir, "events"),
        key="event_type", order_col="event_id", value="value",
        width=_RM_W,
    )
