"""Gate registry extension 118 — contingency batch: Pearson
chi-square independence + Cramér's V."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_X2_Q = ops_stats.ENTROPY_Q
_X2_QF = G.fnum(float(_X2_Q))
_X2_TERM = (
    "((cast(n as double) * cast(o as double)"
    " - cast(r_i as double) * cast(c_j as double))"
    " * (cast(n as double) * cast(o as double)"
    " - cast(r_i as double) * cast(c_j as double)))"
    " / (cast(n as double) * cast(r_i as double)"
    " * cast(c_j as double))"
)
_X2_SQL = f"""
    WITH obs AS MATERIALIZED (
      SELECT user_id % 6 AS a, event_type AS b,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r_i
           FROM obs GROUP BY a),
    cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c_j
           FROM obs GROUP BY b),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                   CAST(count(DISTINCT a) AS BIGINT) AS r,
                   CAST(count(DISTINCT b) AS BIGINT) AS c
            FROM obs),
    agg AS (
      SELECT max(n) AS n, max(r) AS r, max(c) AS c,
             CAST(sum(cast(floor(({_X2_TERM})
               * cast({_X2_Q} as double) + 0.5e0) as bigint))
               AS BIGINT) AS chi_pres_q,
             CAST(sum(cast(floor((cast(r_i as double)
               * cast(c_j as double) / cast(n as double))
               * cast({_X2_Q} as double) + 0.5e0) as bigint))
               AS BIGINT) AS e_pres_q
      FROM obs JOIN ra USING (a) JOIN cb USING (b), tot
    )
    SELECT n, r, c,
           (cast(chi_pres_q as double) + cast(n as double) * {_X2_QF}
            - cast(e_pres_q as double)) / {_X2_QF} AS chi2,
           case when least(r, c) >= 2 then
             sqrt(((cast(chi_pres_q as double)
                    + cast(n as double) * {_X2_QF}
                    - cast(e_pres_q as double)) / {_X2_QF})
                  / (cast(n as double)
                     * (cast(least(r, c) as double) - 1.0e0))) end
             AS cramers_v
    FROM agg
"""


@gate("chi_square", _X2_SQL)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 6).alias("a"),
        F.col("event_type").alias("b"),
    )
    return ops_stats.chi_square_independence(ev, a="a", b="b")
