"""Gate registry extension 115 — linkage/robust-location batch:
Fellegi-Sunter record-linkage weights, exact weighted median."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# fellegi_sunter — labeled pseudo-pairs with one informative and
# one uninformative agreement feature
# ---------------------------------------------------------------------------
_FS_LBL = f"(CASE WHEN {G.lehmer2('event_id')} % 4 = 0 THEN 1 ELSE 0 END)"
_FS_F1 = (
    f"(CASE WHEN {G.lehmer2('event_id * 3 + 1')} % 10"
    f" < 3 + 6 * ({_FS_LBL}) THEN 1 ELSE 0 END)"
)
_FS_F2 = f"({G.lehmer2('event_id * 5 + 2')} % 2)"
_FS_QF = G.fnum(float(ops_dedup.FS_Q))
_FS_M = "(cast(agree_m as double) / cast(n_match as double))"
_FS_U = "(cast(agree_u as double) / cast(n_unmatch as double))"
_FS_SQL = f"""
    WITH pairs AS MATERIALIZED (
      SELECT {_FS_LBL} AS lbl, {_FS_F1} AS f1, {_FS_F2} AS f2
      FROM events
    ),
    unpiv AS (
      SELECT lbl, 'f1' AS feature, f1 AS agree FROM pairs
      UNION ALL
      SELECT lbl, 'f2' AS feature, f2 AS agree FROM pairs
    ),
    agg AS (
      SELECT feature,
             CAST(sum(lbl) AS BIGINT) AS n_match,
             CAST(sum(1 - lbl) AS BIGINT) AS n_unmatch,
             CAST(sum(lbl * agree) AS BIGINT) AS agree_m,
             CAST(sum((1 - lbl) * agree) AS BIGINT) AS agree_u
      FROM unpiv GROUP BY feature
    )
    SELECT feature, n_match, n_unmatch, agree_m, agree_u,
           case when n_match > 0 then {_FS_M} end AS m,
           case when n_unmatch > 0 then {_FS_U} end AS u,
           case when agree_m > 0 and agree_u > 0
             and n_match > 0 and n_unmatch > 0 then
             cast(floor(round(ln({_FS_M} / {_FS_U}), 9) * {_FS_QF}
               + {G.fnum(0.5)}) as bigint) end AS w_agree_q,
           case when agree_m < n_match and agree_u < n_unmatch
             and n_match > 0 and n_unmatch > 0 then
             cast(floor(round(ln((1.0e0 - {_FS_M})
               / (1.0e0 - {_FS_U})), 9) * {_FS_QF}
               + {G.fnum(0.5)}) as bigint) end AS w_disagree_q
    FROM agg
"""


@gate("fellegi_sunter", _FS_SQL)
def q_fellegi_sunter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_FS_LBL).alias("is_match"),
        F.expr(_FS_F1).alias("f1"),
        F.expr(_FS_F2).alias("f2"),
    )
    return ops_dedup.fellegi_sunter(
        ev, features=["f1", "f2"], label="is_match"
    )


# ---------------------------------------------------------------------------
# weighted_median — per-cohort weighted value median
# ---------------------------------------------------------------------------
_WM_SQL = """
    WITH r AS MATERIALIZED (
      SELECT user_id % 23 AS k, event_id % 100 AS v,
             event_id % 7 + 1 AS w, event_id AS id
      FROM events
    ),
    c AS (
      SELECT k, v,
             CAST(sum(w) OVER (PARTITION BY k ORDER BY v, id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumw,
             CAST(sum(w) OVER (PARTITION BY k) AS BIGINT) AS total
      FROM r WHERE w > 0
    )
    SELECT k AS user_id, CAST(max(total) AS BIGINT) AS w_total,
           CAST(min(v) AS BIGINT) AS wmedian
    FROM c WHERE 2 * cumw >= total GROUP BY k
"""


@gate("weighted_median", _WM_SQL)
def q_weighted_median(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 23).alias("k"),
        (F.col("event_id") % 100).alias("v"),
        (F.col("event_id") % 7 + 1).alias("w"),
        F.col("event_id").alias("id"),
    )
    return ops_stats.weighted_median(
        ev, key="k", value="v", weight="w", id_col="id"
    ).select(F.col("k").alias("user_id"), "w_total", "wmedian")
