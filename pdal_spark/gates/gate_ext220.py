"""Gate registry extension 220 — association-rule metrics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import textops as ops_text

_RM_MIN = 5
_RM_IT = f"(CAST({G.lehmer2('event_id')} % 30 AS BIGINT))"
_RM_SQL = f"""
    WITH base AS MATERIALIZED (
      SELECT DISTINCT user_id AS bk, {_RM_IT} AS it
      FROM events
    ),
    n_t AS (
      SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n FROM base
    ),
    items AS (
      SELECT it, CAST(count(*) AS BIGINT) AS c
      FROM base GROUP BY it
    ),
    pairs AS (
      SELECT x.it AS a, y.it AS b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM base x JOIN base y
        ON x.bk = y.bk AND x.it <> y.it
      GROUP BY x.it, y.it
      HAVING count(*) >= {_RM_MIN}
    )
    SELECT a, b, n_ab, ia.c AS n_a, ib.c AS n_b, n,
           cast(n_ab as double) / cast(ia.c as double)
             AS confidence,
           cast(n_ab as double) * cast(n as double)
             / (cast(ia.c as double) * cast(ib.c as double))
             AS lift,
           cast(n_ab as double) / cast(n as double)
             - (cast(ia.c as double) / cast(n as double))
             * (cast(ib.c as double) / cast(n as double))
             AS leverage,
           CASE WHEN cast(n_ab as double) / cast(ia.c as double)
             < 1.0e0 THEN
             (1.0e0 - cast(ib.c as double) / cast(n as double))
             / (1.0e0 - cast(n_ab as double)
               / cast(ia.c as double)) END AS conviction
    FROM pairs
    JOIN items ia ON pairs.a = ia.it
    JOIN items ib ON pairs.b = ib.it, n_t
"""


@gate("rule_metrics", _RM_SQL)
def q_rule_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("bk"),
        F.expr(
            f"cast({G.lehmer2('event_id')} % 30 as bigint)"
        ).alias("it"),
    )
    return ops_text.rule_metrics(
        ev, basket="bk", item="it", min_pair=_RM_MIN
    )
