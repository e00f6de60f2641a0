"""Gate registry extension 64 — blocking quality: reduction ratio /
pair-completeness sufficient statistics for a candidate-pair
generator vs gold matches."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate

# records: orders with o_orderkey % 4 = 0; gold matches = same
# customer; candidate blocking key = o_orderkey % 400 (lossy — the
# realistic partial-recall case).

_BE_REC = "o_orderkey % 4 = 0"


def _be_sql() -> str:
    return f"""
    WITH r AS MATERIALIZED (
      SELECT o_orderkey AS id, o_custkey AS ck,
             o_orderkey % 400 AS blk
      FROM orders WHERE {_BE_REC}
    ),
    cand AS MATERIALIZED (
      SELECT least(x.id, y.id) AS a, greatest(x.id, y.id) AS b
      FROM r x JOIN r y ON x.blk = y.blk AND x.id < y.id
    ),
    gold AS MATERIALIZED (
      SELECT least(x.id, y.id) AS a, greatest(x.id, y.id) AS b
      FROM r x JOIN r y ON x.ck = y.ck AND x.id < y.id
    ),
    hit AS (SELECT * FROM gold SEMI JOIN cand USING (a, b)),
    n AS (SELECT count(*) AS nr FROM r)
    SELECT (SELECT count(*) FROM cand) AS n_cand,
           (SELECT count(*) FROM gold) AS n_gold,
           (SELECT count(*) FROM hit) AS n_hit,
           CAST(nr * (nr - 1) // 2 AS BIGINT) AS n_pairs
    FROM n
    """


@gate("blocking_eval", _be_sql())
def q_blocking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.dedup import blocking_eval

    r = _t(spark, sf_dir, "orders").where(_BE_REC).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("ck"),
        (F.col("o_orderkey") % 400).alias("blk"),
    ).localCheckpoint(eager=True)

    def pairs(col):
        x = r.select(F.col("id").alias("a"), F.col(col).alias("__j"))
        y = r.select(F.col("id").alias("b"), F.col(col).alias("__j"))
        return (
            x.join(y, on="__j")
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
        )

    n = r.count()
    return blocking_eval(pairs("blk"), pairs("ck"), n_records=n)
