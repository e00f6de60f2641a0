"""Gate registry extension 129 — survival-inference batch:
two-group log-rank test over the kaplan_meier subject fixture."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_LR_Q = ops_temporal.LOGRANK_Q
_LR_V = (
    "(cast(dt as double) * cast(n1 as double)"
    " * cast(n2 as double)"
    " * (cast(n1 + n2 as double) - cast(dt as double))"
    " / (cast(n1 + n2 as double) * cast(n1 + n2 as double)"
    " * (cast(n1 + n2 as double) - 1.0e0)))"
)
_LR_SQL = f"""
    WITH subj AS MATERIALIZED (
      SELECT user_id % 2 AS g,
             CAST((epoch_us(max(ts)) - epoch_us(min(ts)))
                  // 3600000000 AS BIGINT) AS t,
             max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS e
      FROM events GROUP BY user_id
    ),
    per AS MATERIALIZED (
      SELECT t, g, CAST(count(*) AS BIGINT) AS leave,
             CAST(sum(e) AS BIGINT) AS d
      FROM subj GROUP BY t, g
    ),
    dense AS (
      SELECT ts.t, gg.g,
             CAST(coalesce(per.leave, 0) AS BIGINT) AS leave,
             CAST(coalesce(per.d, 0) AS BIGINT) AS d
      FROM (SELECT DISTINCT t FROM per) ts
      CROSS JOIN (VALUES (0), (1)) gg(g)
      LEFT JOIN per ON per.t = ts.t AND per.g = gg.g
    ),
    risked AS (
      SELECT t, g, d,
             CAST(sum(leave) OVER (PARTITION BY g ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_g
      FROM dense
    ),
    piv AS (
      SELECT t,
             CAST(sum(CASE WHEN g = 0 THEN n_g ELSE 0 END)
               AS BIGINT) AS n1,
             CAST(sum(CASE WHEN g = 1 THEN n_g ELSE 0 END)
               AS BIGINT) AS n2,
             CAST(sum(CASE WHEN g = 0 THEN d ELSE 0 END)
               AS BIGINT) AS d1,
             CAST(sum(d) AS BIGINT) AS dt
      FROM risked GROUP BY t HAVING sum(d) > 0
    ),
    agg AS (
      SELECT CAST(sum(d1) AS BIGINT) AS o1,
             CAST(sum((dt * n1 * CAST({_LR_Q} AS BIGINT))
               // (n1 + n2)) AS BIGINT) AS e1_q,
             CAST(sum(CASE WHEN n1 + n2 > 1 THEN
               cast(floor({_LR_V} * cast({_LR_Q} as double)
                 + 0.5e0) as bigint) ELSE 0 END) AS BIGINT) AS v_q
      FROM piv
    ),
    tots AS (
      SELECT CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2
      FROM subj
    )
    SELECT n1, n2, o1, e1_q, v_q,
           case when v_q > 0 then
             (cast(o1 as double)
              - cast(e1_q as double) / cast({_LR_Q} as double))
             * (cast(o1 as double)
                - cast(e1_q as double) / cast({_LR_Q} as double))
             / (cast(v_q as double) / cast({_LR_Q} as double)) end
             AS chi2
    FROM tots, agg
"""


@gate("logrank_test", _LR_SQL)
def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    subj = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("grp"),
        ((F.unix_micros(F.max("ts").cast("timestamp"))
          - F.unix_micros(F.min("ts").cast("timestamp")))
         / F.lit(3_600_000_000)).cast("long").alias("dur_h"),
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("ended_error"),
    )
    return ops_temporal.logrank_test(
        subj, group="grp", duration="dur_h", event="ended_error"
    )
