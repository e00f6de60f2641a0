"""Gate registry extension 203 — mobility batch: migration
effectiveness and rank footrule."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import stats as ops_stats

_ME_O = "(user_id % 12)"
_ME_D = f"(CAST({G.lehmer2('event_id')} % 12 AS BIGINT))"
_ME_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT {_ME_O} AS o, {_ME_D} AS d, CAST(1 AS BIGINT) AS c
      FROM events
    ),
    base AS (SELECT * FROM s WHERE o <> d),
    outf AS (
      SELECT o AS zone, CAST(sum(c) AS BIGINT) AS outflow
      FROM base GROUP BY o
    ),
    inf AS (
      SELECT d AS zone, CAST(sum(c) AS BIGINT) AS inflow
      FROM base GROUP BY d
    ),
    j AS (
      SELECT coalesce(outf.zone, inf.zone) AS zone,
             coalesce(inflow, 0) AS inflow,
             coalesce(outflow, 0) AS outflow
      FROM outf FULL OUTER JOIN inf ON outf.zone = inf.zone
    )
    SELECT zone, inflow, outflow,
           CAST(inflow - outflow AS BIGINT) AS net,
           CAST(inflow + outflow AS BIGINT) AS gross,
           CASE WHEN inflow + outflow > 0 THEN
             cast(abs(inflow - outflow) as double)
             / cast(inflow + outflow as double) END AS mei
    FROM j
"""


@gate("migration_effectiveness", _ME_SQL)
def q_migration_effectiveness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_ME_O).alias("o"),
        F.expr(
            f"cast({G.lehmer2('event_id')} % 12 as bigint)"
        ).alias("d"),
        F.lit(1).cast("long").alias("c"),
    )
    return ops_stats.migration_effectiveness(
        ev, origin="o", dest="d", count="c"
    )


_RF_SQL = """
    WITH s AS MATERIALIZED (
      SELECT user_id % 25 AS e, event_id % 2 AS p,
             CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    ra AS (
      SELECT e, CAST(row_number() OVER (ORDER BY t DESC, e ASC)
               AS BIGINT) AS ra
      FROM (SELECT e, CAST(sum(v) AS BIGINT) AS t
            FROM s WHERE p = 0 GROUP BY e) t0
    ),
    rb AS (
      SELECT e, CAST(row_number() OVER (ORDER BY t DESC, e ASC)
               AS BIGINT) AS rb
      FROM (SELECT e, CAST(sum(v) AS BIGINT) AS t
            FROM s WHERE p = 1 GROUP BY e) t1
    ),
    j AS (
      SELECT ra.ra, rb.rb
      FROM ra FULL OUTER JOIN rb ON ra.e = rb.e
    )
    SELECT CAST(sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           CAST(sum(CASE WHEN rb IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_only_a,
           CAST(sum(CASE WHEN ra IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_only_b,
           CAST(sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
             THEN abs(ra - rb) ELSE 0 END) AS BIGINT) AS footrule
    FROM j
"""


@gate("rank_footrule", _RF_SQL)
def q_rank_footrule(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 25).alias("e"),
        (F.col("event_id") % 2).alias("p"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_stats.rank_footrule(
        ev, entity="e", period="p", value="v", p_a=0, p_b=1
    )
