"""Gate registry extension 146 — risk/calibration batch:
Aalen-Johansen competing risks, expected calibration error."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# competing_risks — durations from value, two causes + censoring
# from a deterministic hash
# ---------------------------------------------------------------------------
_CR_DUR = "(CAST(floor(value / 25) AS BIGINT))"
_CR_EV = f"(CAST({G.lehmer2('event_id')} % 3 AS INT))"
_CR_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_CR_DUR} AS t, {_CR_EV} AS e FROM events
    ),
    per_t AS (
      SELECT t, CAST(count(*) AS BIGINT) AS leave,
             CAST(sum(CASE WHEN e = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS d1,
             CAST(sum(CASE WHEN e = 2 THEN 1 ELSE 0 END)
               AS BIGINT) AS d2
      FROM s GROUP BY t
    ),
    risk AS (
      SELECT *, d1 + d2 AS d,
             CAST(sum(leave) OVER (ORDER BY t DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
      FROM per_t
    ),
    ev AS (
      SELECT * FROM risk WHERE d > 0 AND d < n_risk
    ),
    cum0 AS (
      SELECT *,
             CAST(floor(round(ln(1.0e0 - cast(d as double)
               / cast(n_risk as double)), 9)
               * 1.0e9 + 0.5e0) AS BIGINT) AS lt
      FROM ev
    ),
    cum1 AS (
      SELECT *,
             CAST(sum(lt) OVER (ORDER BY t ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM cum0
    ),
    stepped AS (
      SELECT t, n_risk, d1, d2,
             CAST(floor(round(
               exp(cast(cum - lt as double) / 1.0e9)
               * cast(d1 as double) / cast(n_risk as double), 9)
               * 1.0e9 + 0.5e0) AS BIGINT) AS i1,
             CAST(floor(round(
               exp(cast(cum - lt as double) / 1.0e9)
               * cast(d2 as double) / cast(n_risk as double), 9)
               * 1.0e9 + 0.5e0) AS BIGINT) AS i2
      FROM cum1
    )
    SELECT t, n_risk, d1, d2,
           round(cast(sum(i1) OVER (ORDER BY t ASC
             ROWS UNBOUNDED PRECEDING) as double) / 1.0e9, 6)
             AS cif1_r,
           round(cast(sum(i2) OVER (ORDER BY t ASC
             ROWS UNBOUNDED PRECEDING) as double) / 1.0e9, 6)
             AS cif2_r
    FROM stepped
"""


@gate("competing_risks", _CR_SQL)
def q_competing_risks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(floor(value / 25) as bigint)").alias("t"),
        F.expr(_CR_EV).alias("e"),
    )
    return ops_temporal.competing_risks(ev, duration="t", event="e")


# ---------------------------------------------------------------------------
# ece_score — rational confidences num/1000 vs hash labels (the
# log_loss fixture family)
# ---------------------------------------------------------------------------
_EC_SCORE = f"(CAST({G.lehmer2('event_id')} % 1000 AS BIGINT))"
_EC_NUM = f"(100 + {_EC_SCORE} * 4 // 5)"
_EC_NUM_SP = f"(100 + {_EC_SCORE} * 4 div 5)"
_EC_LABEL = (
    f"(CASE WHEN {G.lehmer2('event_id * 17 + 3')} % 1000"
    f" < {_EC_SCORE} THEN 1 ELSE 0 END)"
)
_EC_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_EC_LABEL} AS y, CAST({_EC_NUM} AS BIGINT) AS num
      FROM events
    ),
    bins AS (
      SELECT least((num * 10) // 1000, 9) AS bin,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(y) AS BIGINT) AS pos_b,
             CAST(sum(num) AS BIGINT) AS snum_b
      FROM s GROUP BY least((num * 10) // 1000, 9)
    ),
    agg AS (
      SELECT CAST(sum(n_b) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS bins_used,
             CAST(sum(abs(pos_b * 1000 - snum_b)) AS BIGINT)
               AS ece_num
      FROM bins
    )
    SELECT n, bins_used, ece_num,
           CASE WHEN n > 0 THEN cast(ece_num as double)
             / (cast(1000 as double) * cast(n as double)) END
             AS ece
    FROM agg
"""


@gate("ece_score", _EC_SQL)
def q_ece_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_EC_LABEL).alias("y"),
        F.expr(_EC_NUM_SP).cast("long").alias("num"),
    )
    return ops_stats.ece_score(
        ev, label="y", conf_num="num", conf_den=1000, n_bins=10
    )
