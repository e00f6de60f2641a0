"""Gate registry extension 166 — method-comparison batch:
Hodges-Lehmann shift and Bland-Altman limits."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# hodges_lehmann — two event slices (the mann_whitney fixture
# family, smaller: ~320 x ~320 pairs)
# ---------------------------------------------------------------------------
_HL_A = "event_id % 31 = 0"
_HL_B = "event_id % 31 = 5"
_HL_SQL = f"""
    WITH a AS MATERIALIZED (
      SELECT CAST(floor(value) AS BIGINT) AS xa
      FROM events WHERE {_HL_A}
    ),
    b AS MATERIALIZED (
      SELECT CAST(floor(value) AS BIGINT) AS xb
      FROM events WHERE {_HL_B}
    ),
    pairs AS MATERIALIZED (
      SELECT a.xa - b.xb AS d FROM a CROSS JOIN b
    ),
    ranked AS (
      SELECT d,
             CAST(row_number() OVER (ORDER BY d ASC) AS BIGINT)
               AS rn,
             CAST(count(*) OVER () AS BIGINT) AS np
      FROM pairs
    ),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM a),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM b)
    SELECT n_a, n_b, np AS n_pairs, d AS hl_shift
    FROM ranked, na, nb WHERE rn = (np + 1) // 2
"""


@gate("hodges_lehmann", _HL_SQL)
def q_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.where(_HL_A).select(
        F.expr("cast(floor(value) as bigint)").alias("v")
    )
    b = ev.where(_HL_B).select(
        F.expr("cast(floor(value) as bigint)").alias("v")
    )
    return ops_stats.hodges_lehmann(a, b, value="v")


# ---------------------------------------------------------------------------
# bland_altman — paired scorer comparison (the lins_ccc fixture)
# ---------------------------------------------------------------------------
_BA_X = "CAST(floor(value) AS BIGINT)"
_BA_Y = (
    f"(CAST(floor(value) AS BIGINT) * 9 // 10"
    f" + CAST({G.lehmer2('event_id')} % 7 AS BIGINT))"
)
_BA_Y_SP = (
    f"(cast(floor(value) as bigint) * 9 div 10"
    f" + cast({G.lehmer2('event_id')} % 7 as bigint))"
)
_BA_BIAS = "(cast(sd_sum as double) / cast(n as double))"
_BA_SD = (
    "sqrt(cast(sd_n as double)"
    " / (cast(n as double) * (cast(n as double) - 1.0e0)))"
)
_BA_LO = f"({_BA_BIAS} - 1.96e0 * {_BA_SD})"
_BA_HI = f"({_BA_BIAS} + 1.96e0 * {_BA_SD})"
_BA_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT ({_BA_X}) - ({_BA_Y}) AS d FROM events
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS sd_sum,
             CAST(sum(d * d) AS BIGINT) AS sd2
      FROM s
    ),
    mom2 AS (
      SELECT *, CAST(n * sd2 - sd_sum * sd_sum AS BIGINT) AS sd_n
      FROM mom
    ),
    outside AS (
      SELECT CAST(count(*) AS BIGINT) AS n_outside
      FROM s, mom2
      WHERE n > 1 AND (cast(d as double) < {_BA_LO}
        OR cast(d as double) > {_BA_HI})
    )
    SELECT n, sd_n,
           CASE WHEN n > 1 THEN {_BA_BIAS} END AS bias,
           CASE WHEN n > 1 THEN {_BA_LO} END AS loa_lo,
           CASE WHEN n > 1 THEN {_BA_HI} END AS loa_hi,
           n_outside
    FROM mom2, outside
"""


@gate("bland_altman", _BA_SQL)
def q_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr("cast(floor(value) as bigint)").alias("xv"),
        F.expr(_BA_Y_SP).alias("yv"),
    )
    return ops_stats.bland_altman(ev, x="xv", y="yv")
