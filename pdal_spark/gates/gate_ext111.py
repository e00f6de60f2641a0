"""Gate registry extension 111 — calibration/causal batch:
Nelson-Aalen cumulative hazard, difference-in-differences, IPF
(RAS) matrix balancing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import h3 as ops_h3
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# nelson_aalen — the kaplan_meier subject fixture, hazard view
# ---------------------------------------------------------------------------
_NA_Q = ops_temporal.NA_Q
_NA_SQL = f"""
    WITH subj AS MATERIALIZED (
      SELECT user_id,
             CAST((epoch_us(max(ts)) - epoch_us(min(ts)))
                  // 3600000000 AS BIGINT) AS t,
             max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS e
      FROM events GROUP BY user_id
    ),
    per_t AS (
      SELECT t, CAST(count(*) AS BIGINT) AS leave,
             CAST(sum(e) AS BIGINT) AS d
      FROM subj GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             CAST(sum(leave) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_risk
      FROM per_t
    ),
    stepped AS (
      SELECT t, n_risk, d AS d_events,
             (d * CAST({_NA_Q} AS BIGINT)) // n_risk AS step_q
      FROM risk WHERE d > 0
    )
    SELECT t, n_risk, d_events,
           CAST(sum(step_q) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS h_q,
           cast(sum(step_q) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             as double) / cast({_NA_Q} as double) AS h
    FROM stepped
"""


@gate("nelson_aalen", _NA_SQL)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    subj = ev.groupBy("user_id").agg(
        ((F.unix_micros(F.max("ts").cast("timestamp"))
          - F.unix_micros(F.min("ts").cast("timestamp")))
         / F.lit(3_600_000_000)).cast("long").alias("dur_h"),
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("ended_error"),
    )
    return ops_temporal.nelson_aalen(
        subj, duration="dur_h", event="ended_error"
    )


# ---------------------------------------------------------------------------
# diff_in_diff — synthetic rollout: treated cohort gets +9 in the
# post period
# ---------------------------------------------------------------------------
_DD_Y = (
    "(event_id % 50 + (user_id % 2) * (event_id % 2) * 9)"
)
_DD_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id % 2 AS g, event_id % 2 AS p, {_DD_Y} AS y
      FROM events
    )
    SELECT
      CAST(sum(CASE WHEN g = 0 AND p = 0 THEN y END) AS BIGINT)
        AS c_pre_s,
      CAST(sum(CASE WHEN g = 0 AND p = 0 THEN 1 ELSE 0 END)
        AS BIGINT) AS c_pre_n,
      CAST(sum(CASE WHEN g = 0 AND p = 1 THEN y END) AS BIGINT)
        AS c_post_s,
      CAST(sum(CASE WHEN g = 0 AND p = 1 THEN 1 ELSE 0 END)
        AS BIGINT) AS c_post_n,
      CAST(sum(CASE WHEN g = 1 AND p = 0 THEN y END) AS BIGINT)
        AS t_pre_s,
      CAST(sum(CASE WHEN g = 1 AND p = 0 THEN 1 ELSE 0 END)
        AS BIGINT) AS t_pre_n,
      CAST(sum(CASE WHEN g = 1 AND p = 1 THEN y END) AS BIGINT)
        AS t_post_s,
      CAST(sum(CASE WHEN g = 1 AND p = 1 THEN 1 ELSE 0 END)
        AS BIGINT) AS t_post_n,
      (cast(sum(CASE WHEN g = 1 AND p = 1 THEN y END) as double)
       / cast(sum(CASE WHEN g = 1 AND p = 1 THEN 1 ELSE 0 END)
              as double)
       - cast(sum(CASE WHEN g = 1 AND p = 0 THEN y END) as double)
       / cast(sum(CASE WHEN g = 1 AND p = 0 THEN 1 ELSE 0 END)
              as double))
      - (cast(sum(CASE WHEN g = 0 AND p = 1 THEN y END) as double)
         / cast(sum(CASE WHEN g = 0 AND p = 1 THEN 1 ELSE 0 END)
                as double)
         - cast(sum(CASE WHEN g = 0 AND p = 0 THEN y END)
                as double)
         / cast(sum(CASE WHEN g = 0 AND p = 0 THEN 1 ELSE 0 END)
                as double)) AS did
    FROM s
"""


@gate("diff_in_diff", _DD_SQL)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("treated"),
        (F.col("event_id") % 2).alias("post"),
        F.expr(_DD_Y).alias("y"),
    )
    return ops_stats.diff_in_diff(ev)


# ---------------------------------------------------------------------------
# ipf_balance — calibrate a (user % 7) x (event % 5) count seed to
# synthetic marginals, 2 unrolled sweeps
# ---------------------------------------------------------------------------
_IP_Q = ops_h3.IPF_Q
_IP_ROUNDS = 2


def _ipf_sql() -> str:
    parts = [f"""
    WITH cur0 AS MATERIALIZED (
      SELECT user_id % 7 AS i, event_id % 5 AS j,
             CAST(count(*) AS BIGINT) * {_IP_Q} AS t_q
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT DISTINCT user_id % 7 AS i,
                  (user_id % 7 + 2) * 50 AS rt FROM events),
    ct AS (SELECT DISTINCT event_id % 5 AS j,
                  (event_id % 5 + 2) * 70 AS ct FROM events)"""]
    cur = "cur0"
    step = 0
    for _ in range(_IP_ROUNDS):
        step += 1
        parts.append(f""",
    rs{step} AS (SELECT i, CAST(sum(t_q) AS BIGINT) AS ms
                 FROM {cur} GROUP BY i),
    cur{step} AS MATERIALIZED (
      SELECT {cur}.i, {cur}.j,
             CASE WHEN ms > 0 THEN
               (t_q * rt * {_IP_Q}) // ms ELSE 0 END AS t_q
      FROM {cur} JOIN rs{step} USING (i) JOIN rt USING (i)
    )""")
        cur = f"cur{step}"
        step += 1
        parts.append(f""",
    cs{step} AS (SELECT j, CAST(sum(t_q) AS BIGINT) AS ms
                 FROM {cur} GROUP BY j),
    cur{step} AS MATERIALIZED (
      SELECT {cur}.i, {cur}.j,
             CASE WHEN ms > 0 THEN
               (t_q * ct * {_IP_Q}) // ms ELSE 0 END AS t_q
      FROM {cur} JOIN cs{step} USING (j) JOIN ct USING (j)
    )""")
        cur = f"cur{step}"
    parts.append(f"""
    SELECT i, j, CAST(t_q AS BIGINT) AS t_q,
           cast(t_q as double) / cast({_IP_Q} as double) AS t_fit
    FROM {cur}
    """)
    return "".join(parts)


@gate("ipf_balance", _ipf_sql())
def q_ipf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    seed = ev.groupBy(
        (F.col("user_id") % 7).alias("i"),
        (F.col("event_id") % 5).alias("j"),
    ).agg(F.count(F.lit(1)).alias("t"))
    rt = ev.select(
        (F.col("user_id") % 7).alias("i")
    ).distinct().select(
        "i", ((F.col("i") + 2) * 50).alias("target")
    )
    ct = ev.select(
        (F.col("event_id") % 5).alias("j")
    ).distinct().select(
        "j", ((F.col("j") + 2) * 70).alias("target")
    )
    return ops_h3.ipf_balance(
        seed, rt, ct, rounds=_IP_ROUNDS, i="i", j="j", t="t"
    )
