"""Gate registry extension 51 — evaluation batch: `pdal eval`-style
per-label confusion statistics between a predicted and a truth
classification over the same point ids."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate

# ---------------------------------------------------------------------------
# classification_eval — kernels/private/EvalUtils (pdal eval):
# tp/fp/fn/support per label over the common-id join of predicted
# vs truth. Predicted labels: o_orderkey % 5; truth labels:
# o_custkey % 5 restricted to o_orderkey % 3 <> 0, so the inner
# join (common ids only, like the kernel's shared-point iteration)
# is exercised.
# ---------------------------------------------------------------------------

_EVAL_LABELS = [0, 1, 2, 3, 4]


def _eval_sql() -> str:
    labs = ", ".join(str(v) for v in _EVAL_LABELS)
    return f"""
    WITH p AS (
      SELECT o_orderkey AS id,
             CAST(o_orderkey % 5 AS BIGINT) AS pl
      FROM orders
    ),
    t AS (
      SELECT o_orderkey AS id,
             CAST(o_custkey % 5 AS BIGINT) AS tl
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    j AS (SELECT p.pl, t.tl FROM p JOIN t ON p.id = t.id),
    lab AS (SELECT unnest([{labs}]) AS label)
    SELECT lab.label,
           CAST(sum(CASE WHEN pl = label AND tl = label
                    THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN pl = label AND tl <> label
                    THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN pl <> label AND tl = label
                    THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN tl = label THEN 1 ELSE 0 END)
                AS BIGINT) AS support,
           count(*) AS n
    FROM j CROSS JOIN lab
    GROUP BY 1
    """


@gate("classification_eval", _eval_sql())
def q_classification_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pdal_spark.operators.stats import classification_eval

    orders = _t(spark, sf_dir, "orders")
    pred = orders.select(
        F.col("o_orderkey").alias("pid"),
        (F.col("o_orderkey") % 5).alias("Classification"),
    )
    truth = orders.where("o_orderkey % 3 <> 0").select(
        F.col("o_orderkey").alias("pid"),
        (F.col("o_custkey") % 5).alias("Classification"),
    )
    return classification_eval(pred, truth, _EVAL_LABELS)
