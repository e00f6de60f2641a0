"""Gate registry extension 185 — designed-experiment batch:
balanced two-way ANOVA and Dixon's Q."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_TW_R = 40  # rows kept per cell (sized for the SMALLEST sf) -> balanced
_TW_Q = ops_stats.TWA_Q


def _tw_qdiv(d: str, nn: str) -> str:
    return (
        f"(({d}) // ({nn})) * CAST({_TW_Q} AS BIGINT)"
        f" + ((({d}) % ({nn})) * CAST({_TW_Q} AS BIGINT))"
        f" // ({nn})"
    )


_TW_CELLS = f"""
    ranked AS MATERIALIZED (
      SELECT user_id % 3 AS fa, event_id % 4 AS fb,
             CAST(floor(value) AS BIGINT)
               + (user_id % 3) * 5 + (event_id % 4) * 2 AS v,
             row_number() OVER (PARTITION BY user_id % 3,
               event_id % 4 ORDER BY event_id ASC) AS rn
      FROM events
    ),
    kept AS MATERIALIZED (
      SELECT fa, fb, v FROM ranked WHERE rn <= {_TW_R}
    )
"""

_TW_SSA = "(sa_q - ct_q)"
_TW_SSB = "(sb_q - ct_q)"
_TW_SSAB = f"(sc_q - ct_q - {_TW_SSA} - {_TW_SSB})"
_TW_SSE = f"(ssx * CAST({_TW_Q} AS BIGINT) - sc_q)"
_TW_DFA = "(cast(a_levels as double) - 1.0e0)"
_TW_DFB = "(cast(b_levels as double) - 1.0e0)"
_TW_DFAB = f"({_TW_DFA} * {_TW_DFB})"
_TW_DFE = (
    "(cast(a_levels as double) * cast(b_levels as double)"
    f" * ({float(_TW_R)!r}e0 - 1.0e0))"
)
_TW_MSE = f"(cast({_TW_SSE} as double) / {_TW_DFE})"
_TW_SQL = f"""
    WITH {_TW_CELLS},
    cells AS MATERIALIZED (
      SELECT fa, fb, CAST(count(*) AS BIGINT) AS r,
             CAST(sum(v) AS BIGINT) AS t_ab,
             CAST(sum(v * v) AS BIGINT) AS ss_ab
      FROM kept GROUP BY fa, fb
    ),
    ta AS (SELECT fa, CAST(sum(t_ab) AS BIGINT) AS t_a
           FROM cells GROUP BY fa),
    tb AS (SELECT fb, CAST(sum(t_ab) AS BIGINT) AS t_b
           FROM cells GROUP BY fb),
    na AS (SELECT CAST(count(*) AS BIGINT) AS a_levels FROM ta),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS b_levels FROM tb),
    tot AS (
      SELECT CAST(sum(t_ab) AS BIGINT) AS t,
             CAST(sum(ss_ab) AS BIGINT) AS ssx,
             CAST(sum(r) AS BIGINT) AS n
      FROM cells
    ),
    sa AS (
      SELECT CAST(sum({_tw_qdiv('t_a * t_a',
                                f'b_levels * {_TW_R}')})
               AS BIGINT) AS sa_q
      FROM ta, nb
    ),
    sb AS (
      SELECT CAST(sum({_tw_qdiv('t_b * t_b',
                                f'a_levels * {_TW_R}')})
               AS BIGINT) AS sb_q
      FROM tb, na
    ),
    sc AS (
      SELECT CAST(sum({_tw_qdiv('t_ab * t_ab', str(_TW_R))})
               AS BIGINT) AS sc_q
      FROM cells
    ),
    closing AS (
      SELECT a_levels, b_levels, sa_q, sb_q, sc_q, ssx,
             CAST({_tw_qdiv('t * t', 'n')} AS BIGINT) AS ct_q
      FROM na, nb, sa, sb, sc, tot
    )
    SELECT a_levels, b_levels, CAST({_TW_R} AS BIGINT) AS r,
           CAST({_TW_SSA} AS BIGINT) AS ssa_q,
           CAST({_TW_SSB} AS BIGINT) AS ssb_q,
           CAST({_TW_SSAB} AS BIGINT) AS ssab_q,
           CAST({_TW_SSE} AS BIGINT) AS sse_q,
           CASE WHEN {_TW_MSE} > 0.0e0 THEN
             (cast({_TW_SSA} as double) / {_TW_DFA}) / {_TW_MSE}
             END AS f_a,
           CASE WHEN {_TW_MSE} > 0.0e0 THEN
             (cast({_TW_SSB} as double) / {_TW_DFB}) / {_TW_MSE}
             END AS f_b,
           CASE WHEN {_TW_MSE} > 0.0e0 THEN
             (cast({_TW_SSAB} as double) / {_TW_DFAB}) / {_TW_MSE}
             END AS f_ab
    FROM closing
"""


@gate("two_way_anova", _TW_SQL)
def q_two_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy(
        F.expr("user_id % 3"), F.expr("event_id % 4")
    ).orderBy(F.col("event_id").asc())
    kept = (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TW_R)
        .select(
            F.expr("user_id % 3").alias("fa"),
            F.expr("event_id % 4").alias("fb"),
            F.expr(
                "cast(floor(value) as bigint)"
                " + (user_id % 3) * 5 + (event_id % 4) * 2"
            ).alias("v"),
        )
    )
    return ops_stats.two_way_anova(
        kept, factor_a="fa", factor_b="fb", value="v"
    )


_DQ_PRED = "event_id % 53 = 0"
_DQ_SQL = f"""
    WITH base AS MATERIALIZED (
      SELECT CAST(floor(value) AS BIGINT) AS v,
             CAST(row_number() OVER (ORDER BY floor(value) ASC,
               event_id ASC) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM events WHERE {_DQ_PRED}
    ),
    agg AS (
      SELECT n,
             CAST(min(CASE WHEN rn = 1 THEN v END) AS BIGINT)
               AS x1,
             CAST(min(CASE WHEN rn = 2 THEN v END) AS BIGINT)
               AS x2,
             CAST(min(CASE WHEN rn = n - 1 THEN v END) AS BIGINT)
               AS xn1,
             CAST(min(CASE WHEN rn = n THEN v END) AS BIGINT)
               AS xn
      FROM base WHERE rn IN (1, 2) OR rn IN (n - 1, n)
      GROUP BY n
    )
    SELECT n, CAST(x2 - x1 AS BIGINT) AS gap_low,
           CAST(xn - xn1 AS BIGINT) AS gap_high,
           CAST(xn - x1 AS BIGINT) AS range,
           CASE WHEN xn - x1 > 0 THEN cast(x2 - x1 as double)
             / cast(xn - x1 as double) END AS q_low,
           CASE WHEN xn - x1 > 0 THEN cast(xn - xn1 as double)
             / cast(xn - x1 as double) END AS q_high
    FROM agg
"""


@gate("dixon_q", _DQ_SQL)
def q_dixon_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_DQ_PRED).select(
        F.expr("cast(floor(value) as bigint)").alias("v")
    )
    return ops_stats.dixon_q(ev, value="v")
