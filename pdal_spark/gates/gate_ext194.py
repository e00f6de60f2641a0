"""Gate registry extension 194 — paired-comparison batch: Doksum
shift function and the sign test."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_SF_A = "user_id % 2 = 0"
_SF_B = "user_id % 2 = 1"
_SF_PCTS = [10, 25, 50, 75, 90]
_SF_PL = ", ".join(map(str, _SF_PCTS))


def _sf_q(pred: str, out: str) -> str:
    return f"""
      SELECT CAST(t.p AS BIGINT) AS p, v AS {out}
      FROM (
        SELECT CAST(floor(value) AS BIGINT) AS v,
               CAST(row_number() OVER (ORDER BY floor(value) ASC,
                 event_id ASC) AS BIGINT) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM events WHERE {pred}
      ) b, (SELECT unnest([{_SF_PL}]) AS p) t
      WHERE rn = (t.p * n + 99) // 100
    """


_SF_SQL = f"""
    WITH qa AS MATERIALIZED ({_sf_q(_SF_A, 'q_a')}),
    qb AS MATERIALIZED ({_sf_q(_SF_B, 'q_b')})
    SELECT p, q_a, q_b, CAST(q_b - q_a AS BIGINT) AS shift
    FROM qa JOIN qb USING (p)
"""


@gate("shift_function", _SF_SQL)
def q_shift_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.where(_SF_A).select(
        F.expr("cast(floor(value) as bigint)").alias("v")
    )
    b = ev.where(_SF_B).select(
        F.expr("cast(floor(value) as bigint)").alias("v")
    )
    return ops_stats.shift_function(a, b, value="v",
                                    pcts=_SF_PCTS)


_ST_X = "CAST(floor(value) AS BIGINT)"
_ST_Y = (
    f"(CAST(floor(value) AS BIGINT)"
    f" + CAST({G.lehmer2('event_id')} % 11 AS BIGINT) - 3)"
)
_ST_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT ({_ST_X}) - ({_ST_Y}) AS d FROM events
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_neg,
             CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_tie
      FROM s
    )
    SELECT n, n_pos, n_neg, n_tie,
           CASE WHEN n_pos + n_neg > 0 THEN
             (cast(abs(n_pos - n_neg) as double) - 1.0e0)
             / sqrt(cast(n_pos + n_neg as double)) END AS z
    FROM agg
"""


@gate("sign_test", _ST_SQL)
def q_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(floor(value) as bigint)").alias("xv"),
        F.expr(
            f"cast(floor(value) as bigint)"
            f" + cast({G.lehmer2('event_id')} % 11 as bigint) - 3"
        ).alias("yv"),
    )
    return ops_stats.sign_test(ev, x="xv", y="yv")
