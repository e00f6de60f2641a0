"""Gate registry extension 55 — data-mixing planner: per-source
token targets from integer mixture weights with largest-remainder
rounding, plus the loader geometry (epochs / residual / rate)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate

_MP_B = 100_000


def _mixing_sql() -> str:
    from pdal_spark.operators.textops import MIX_Q

    b = _MP_B
    return f"""
    WITH s AS MATERIALIZED (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS n_tokens,
             CAST(1 + CAST(substr(source, 4) AS INT) % 7 AS BIGINT)
               AS weight_q
      FROM documents GROUP BY 1
    ),
    t AS (
      SELECT source, n_tokens, weight_q,
             ({b} * weight_q) // sum(weight_q) OVER () AS fl,
             ({b} * weight_q) % sum(weight_q) OVER () AS rem
      FROM s
    ),
    u AS (
      SELECT *, sum(fl) OVER () AS fsum,
             row_number() OVER (ORDER BY rem DESC, source ASC)
               AS rr
      FROM t
    ),
    v AS (
      SELECT source, n_tokens, weight_q,
             fl + CASE WHEN rr <= {b} - fsum THEN 1 ELSE 0 END
               AS target
      FROM u
    )
    SELECT source, n_tokens AS avail,
           CAST(weight_q AS BIGINT) AS weight_q,
           CAST(target AS BIGINT) AS target,
           CAST(target // n_tokens AS BIGINT) AS epochs,
           CAST(target % n_tokens AS BIGINT) AS residual,
           CAST((target * {MIX_Q}) // n_tokens AS BIGINT) AS rate_q
    FROM v
    """


@gate("mixing_plan", _mixing_sql())
def q_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import mixing_plan

    srcs = _t(spark, sf_dir, "documents").groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long")
        .alias("n_tokens"),
    ).withColumn(
        "weight_q",
        (F.substring("source", 4, 10).cast("int") % 7 + 1)
        .cast("long"),
    )
    return mixing_plan(srcs, budget=_MP_B)
