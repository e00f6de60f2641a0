"""Gate registry extension 138 — link-prediction baselines
(resource allocation, preferential attachment) and Cochran's Q."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext12 import _EDGES_SQL, _edges
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import stats as ops_stats

# ---------------------------------------------------------------------------
# resource_allocation — same open-wedge enumeration as adamic_adar;
# term = RA_Q // deg(center), all int64 (no ln anywhere).
# ---------------------------------------------------------------------------
_RA_SQL = f"""
    WITH {_EDGES_SQL},
    adj AS MATERIALIZED (
      SELECT lo AS v, hi AS n FROM e
      UNION ALL SELECT hi, lo FROM e
    ),
    wedges AS MATERIALIZED (
      SELECT a.n AS u, b.n AS w, a.v AS v
      FROM adj a JOIN adj b ON b.v = a.v AND a.n < b.n
    ),
    open_w AS MATERIALIZED (
      SELECT wedges.u, wedges.w, wedges.v FROM wedges
      ANTI JOIN e ON e.lo = wedges.u AND e.hi = wedges.w
    )
    SELECT o.u, o.w, CAST(count(*) AS BIGINT) AS cn,
           CAST(sum({ops_graph.RA_Q} // deg.degree) AS BIGINT)
             AS ra_q
    FROM open_w o JOIN deg ON deg.node = o.v
    GROUP BY o.u, o.w
"""


@gate("resource_allocation", _RA_SQL)
def q_resource_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return ops_graph.resource_allocation(_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# preferential_attachment — degree-product baseline on the same
# wedge-connected candidate pairs.
# ---------------------------------------------------------------------------
_PA_SQL = f"""
    WITH {_EDGES_SQL},
    adj AS MATERIALIZED (
      SELECT lo AS v, hi AS n FROM e
      UNION ALL SELECT hi, lo FROM e
    ),
    pairs AS MATERIALIZED (
      SELECT a.n AS u, b.n AS w
      FROM adj a JOIN adj b ON b.v = a.v AND a.n < b.n
    ),
    open_p AS MATERIALIZED (
      SELECT pairs.u, pairs.w FROM pairs
      ANTI JOIN e ON e.lo = pairs.u AND e.hi = pairs.w
    ),
    cn AS MATERIALIZED (
      SELECT u, w, CAST(count(*) AS BIGINT) AS cn
      FROM open_p GROUP BY u, w
    )
    SELECT cn.u, cn.w, cn.cn,
           CAST(du.degree * dw.degree AS BIGINT) AS pa
    FROM cn
    JOIN deg du ON du.node = cn.u
    JOIN deg dw ON dw.node = cn.w
"""


@gate("preferential_attachment", _PA_SQL)
def q_preferential_attachment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return ops_graph.preferential_attachment(_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# cochran_q — 3 "treatments" (event_id mod) x 200 subjects, success
# = deterministic hash indicator aggregated per cell
# ---------------------------------------------------------------------------
_CQ_X = f"(CASE WHEN {G.lehmer2('event_id')} % 7 < 3 THEN 1 ELSE 0 END)"
_CQ_SQL = f"""
    WITH cells AS MATERIALIZED (
      SELECT user_id % 200 AS i, event_id % 3 AS j,
             CAST(max({_CQ_X}) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    kk AS (
      SELECT CAST(count(DISTINCT j) AS BIGINT) AS k FROM cells
    ),
    gj AS (
      SELECT j, CAST(sum(x) AS BIGINT) AS g FROM cells GROUP BY j
    ),
    li AS (
      SELECT i, CAST(sum(x) AS BIGINT) AS l FROM cells GROUP BY i
    ),
    gm AS (
      SELECT CAST(sum(g) AS BIGINT) AS t,
             CAST(sum(g * g) AS BIGINT) AS sg2
      FROM gj
    ),
    lm AS (
      SELECT CAST(count(*) AS BIGINT) AS n_subjects,
             CAST(sum(l * l) AS BIGINT) AS sl2
      FROM li
    )
    SELECT k, n_subjects, t, sg2, sl2,
           CASE WHEN k * t - sl2 > 0 THEN
             (cast(k as double) - 1.0e0)
             * (cast(k as double) * cast(sg2 as double)
             - cast(t as double) * cast(t as double))
             / (cast(k as double) * cast(t as double)
             - cast(sl2 as double)) END AS q
    FROM kk, gm, lm
"""


@gate("cochran_q", _CQ_SQL)
def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = (
        ev.groupBy(
            (F.col("user_id") % 200).alias("i"),
            (F.col("event_id") % 3).alias("j"),
        )
        .agg(F.max(F.expr(_CQ_X)).cast("long").alias("x"))
    )
    return ops_stats.cochran_q(
        cells, subject="i", treatment="j", success="x"
    )
