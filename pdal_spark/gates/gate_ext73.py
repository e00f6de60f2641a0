"""Gate registry extension 73 — classical additive seasonal
decomposition of per-type event-value series (period 24, the
even-period half-weight-endpoint centered MA). Every compared
column is an exact integer on the shared 2*period*Q scale; the two
truncating means (per phase, across phases) divide possibly
NEGATIVE detrended sums — Spark `div` truncates toward zero while
DuckDB `//` floors (the geometric_median sign trap), so the oracle
emulates toward-zero: CASE WHEN s >= 0 THEN s // n
ELSE -((-s) // n) END.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark.gate import _t, gate
from pdal_spark.operators.temporal import SD_Q, seasonal_decompose

_SD_P = 24


def _sd_sql() -> str:
    p, h, q = _SD_P, _SD_P // 2, SD_Q
    return f"""
    WITH base AS MATERIALIZED (
      SELECT event_type AS k, event_id AS o,
             CAST(floor(value * {q} + 0.5e0) AS BIGINT) AS v_q
      FROM events
    ),
    t AS MATERIALIZED (
      SELECT k, o, v_q,
             (row_number() OVER win - 1) % {p} AS phase,
             CASE WHEN count(*) OVER
                    (win ROWS BETWEEN {h} PRECEDING
                     AND {h} FOLLOWING) = {p + 1}
                  THEN 2 * sum(v_q) OVER
                    (win ROWS BETWEEN {h} PRECEDING
                     AND {h} FOLLOWING)
                    - lag(v_q, {h}) OVER win
                    - lead(v_q, {h}) OVER win
             END AS trend2p_q
      FROM base
      WINDOW win AS (PARTITION BY k ORDER BY o)
    ),
    d AS MATERIALIZED (
      SELECT k, o, v_q, phase, trend2p_q,
             CASE WHEN trend2p_q IS NOT NULL
                  THEN v_q * {2 * p} - trend2p_q END AS detr
      FROM t
    ),
    ph AS MATERIALIZED (
      SELECT k, phase,
             CAST(sum(detr) AS BIGINT) AS s_sum,
             count(*) AS s_n
      FROM d WHERE detr IS NOT NULL GROUP BY 1, 2
    ),
    phm AS (
      SELECT k, phase,
             CASE WHEN s_sum >= 0 THEN s_sum // s_n
                  ELSE -((-s_sum) // s_n) END AS s_raw
      FROM ph
    ),
    ctr AS (
      SELECT k,
             CASE WHEN sum(s_raw) >= 0
                  THEN CAST(sum(s_raw) AS BIGINT) // count(*)
                  ELSE -(CAST(-sum(s_raw) AS BIGINT) // count(*))
             END AS c
      FROM phm GROUP BY 1
    ),
    seas AS (
      SELECT phm.k, phm.phase,
             CAST(phm.s_raw - ctr.c AS BIGINT) AS seas2p_q
      FROM phm JOIN ctr ON ctr.k = phm.k
    )
    SELECT d.k AS event_type, d.o AS event_id, d.phase, d.v_q,
           d.trend2p_q, seas.seas2p_q,
           CASE WHEN d.detr IS NOT NULL
                     AND seas.seas2p_q IS NOT NULL
                THEN d.detr - seas.seas2p_q END AS rem2p_q
    FROM d LEFT JOIN seas
      ON seas.k = d.k AND seas.phase = d.phase
    """


@gate("seasonal_decompose", _sd_sql())
def q_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_decompose(
        _t(spark, sf_dir, "events"),
        key="event_type", order_col="event_id", value="value",
        period=_SD_P,
    )

