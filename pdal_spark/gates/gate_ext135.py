"""Gate registry extension 135 — effect-size batch: Mantel-Haenszel
pooled odds ratio and Cohen's d."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# mantel_haenszel — the odds_ratio fixture stratified by event bins
# ---------------------------------------------------------------------------
_MQ = ops_stats.MH_Q
_MH_EXP = f"(CASE WHEN {G.lehmer2('event_id')} % 3 = 0 THEN 1 ELSE 0 END)"
_MH_CASE = (
    f"(CASE WHEN {G.lehmer2('event_id * 7 + 1')} % 10"
    f" < 2 + 3 * ({_MH_EXP}) THEN 1 ELSE 0 END)"
)
_MH_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id % 5 AS st, {_MH_EXP} AS e, {_MH_CASE} AS y
      FROM events
    ),
    per AS (
      SELECT st,
             CAST(sum(e * y) AS BIGINT) AS a,
             CAST(sum(e * (1 - y)) AS BIGINT) AS b,
             CAST(sum((1 - e) * y) AS BIGINT) AS c,
             CAST(sum((1 - e) * (1 - y)) AS BIGINT) AS d
      FROM s GROUP BY st
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum((a * d * CAST({_MQ} AS BIGINT))
               // (a + b + c + d)) AS BIGINT) AS num_q,
             CAST(sum((b * c * CAST({_MQ} AS BIGINT))
               // (a + b + c + d)) AS BIGINT) AS den_q
      FROM per WHERE a + b + c + d > 0
    )
    SELECT n_strata, num_q, den_q,
           case when den_q > 0 then
             cast(num_q as double) / cast(den_q as double) end
             AS or_mh
    FROM agg
"""


@gate("mantel_haenszel", _MH_SQL)
def q_mantel_haenszel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % 5).alias("st"),
        F.expr(_MH_EXP).alias("exposed"),
        F.expr(_MH_CASE).alias("is_case"),
    )
    return ops_stats.mantel_haenszel(
        ev, stratum="st", exposed="exposed", case="is_case"
    )


# ---------------------------------------------------------------------------
# cohens_d — effect size of the diff_in_diff cohorts' values
# ---------------------------------------------------------------------------
_CD_SQL = """
    WITH per AS MATERIALIZED (
      SELECT user_id % 2 AS g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(event_id % 43 + (user_id % 2) * 5) AS BIGINT)
               AS s,
             CAST(sum((event_id % 43 + (user_id % 2) * 5)
                  * (event_id % 43 + (user_id % 2) * 5)) AS BIGINT)
               AS ss
      FROM events GROUP BY 1
    ),
    piv AS (
      SELECT max(CASE WHEN g = 0 THEN n END) AS n0,
             max(CASE WHEN g = 0 THEN s END) AS s0,
             max(CASE WHEN g = 0 THEN ss END) AS ss0,
             max(CASE WHEN g = 1 THEN n END) AS n1,
             max(CASE WHEN g = 1 THEN s END) AS s1,
             max(CASE WHEN g = 1 THEN ss END) AS ss1
      FROM per
    )
    SELECT n0, n1,
           case when n0 is not null and n1 is not null
             and n0 + n1 > 2
             and (((cast(n0 as double) * cast(ss0 as double)
                    - cast(s0 as double) * cast(s0 as double))
                   / cast(n0 as double)
                   + (cast(n1 as double) * cast(ss1 as double)
                      - cast(s1 as double) * cast(s1 as double))
                   / cast(n1 as double))
                  / (cast(n0 as double) + cast(n1 as double)
                     - 2.0e0)) > 0 then
             (cast(s1 as double) / cast(n1 as double)
              - cast(s0 as double) / cast(n0 as double))
             / sqrt((((cast(n0 as double) * cast(ss0 as double)
                       - cast(s0 as double) * cast(s0 as double))
                      / cast(n0 as double)
                      + (cast(n1 as double) * cast(ss1 as double)
                         - cast(s1 as double) * cast(s1 as double))
                      / cast(n1 as double))
                     / (cast(n0 as double) + cast(n1 as double)
                        - 2.0e0))) end AS d
    FROM piv
"""


@gate("cohens_d", _CD_SQL)
def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("grp"),
        (F.col("event_id") % 43 + (F.col("user_id") % 2) * 5)
        .alias("y"),
    )
    return ops_stats.cohens_d(ev, group="grp", value="y")
