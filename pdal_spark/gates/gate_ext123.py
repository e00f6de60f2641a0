"""Gate registry extension 123 — multiple-testing batch:
Benjamini-Hochberg FDR step-up."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_BH_P = f"({G.lehmer2('event_id')} % {ops_stats.BH_Q})"
_BH_MOD = 11
_BH_SQL = f"""
    WITH tests AS MATERIALIZED (
      SELECT event_id AS id, {_BH_P} AS p
      FROM events WHERE event_id % {_BH_MOD} = 0
    ),
    r AS (
      SELECT id, p,
             row_number() OVER (ORDER BY p, id) AS rank,
             count(*) OVER () AS m
      FROM tests
    ),
    flagged AS (
      SELECT id, p, rank, m,
             CASE WHEN p * m * 100 <= rank * 5 * {ops_stats.BH_Q}
               THEN rank ELSE 0 END AS hit
      FROM r
    )
    SELECT id, p AS p_q, CAST(rank AS BIGINT) AS rank,
           CAST(max(hit) OVER () AS BIGINT) AS k_sel,
           rank <= max(hit) OVER () AS reject
    FROM flagged
"""


@gate("bh_fdr", _BH_SQL)
def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_id") % _BH_MOD == 0
    ).select(
        F.col("event_id").alias("id"),
        F.expr(_BH_P).alias("p_q"),
    )
    return ops_stats.bh_fdr(ev, p_q="p_q", id_col="id", q_pct=5)
