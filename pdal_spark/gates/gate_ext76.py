"""Gate registry extension 76 — CUPED variance-reduced A/B readout
(Deng et al. 2013) over events: metric = quantized value, covariate
= the metric plus deterministic per-event noise (a correlated
pre-period stand-in), arms = user_id % 2. All sufficient statistics
exact int64; theta / adjusted means via the ONE shared expression
string (`stats.cuped_exprs`) on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators.stats import cuped_adjust, cuped_exprs

# covariate = y_q + bounded deterministic noise -> strongly
# correlated, so theta is far from 0 and the adjustment is real.
# Gate quantizer is 2^8, NOT the op-default 2^20: sum(x_q^2) must
# stay inside int64 at every SF (value ~ 10^3 -> x ~ 2.6e5,
# x^2 ~ 7e10, x 10^8 rows ~ 7e18 < 2^63).
_CU_Q = 1 << 8
_CU_Y = f"CAST(floor(value * {_CU_Q} + 0.5e0) AS BIGINT)"
_CU_X = f"({_CU_Y} + ({{lehmer}} % {_CU_Q}))"


def _cuped_sql() -> str:
    x = _CU_X.format(lehmer=G.lehmer2("event_id"))
    ex = cuped_exprs()
    return f"""
    WITH base AS MATERIALIZED (
      SELECT user_id % 2 AS arm,
             {_CU_Y} AS y_q,
             {x} AS x_q
      FROM events
    ),
    pooled AS (
      SELECT count(*) AS n_all,
             CAST(sum(x_q) AS BIGINT) AS sx,
             CAST(sum(y_q) AS BIGINT) AS sy,
             CAST(sum(x_q * x_q) AS BIGINT) AS sxx,
             CAST(sum(x_q * y_q) AS BIGINT) AS sxy
      FROM base
    ),
    arms AS (
      SELECT arm, count(*) AS n,
             CAST(sum(y_q) AS BIGINT) AS arm_sy,
             CAST(sum(x_q) AS BIGINT) AS arm_sx
      FROM base GROUP BY 1
    )
    SELECT arm, n, arm_sy, arm_sx, n_all, sx, sy, sxx, sxy,
           {ex['theta']} AS theta,
           {ex['mean_adj']} AS mean_adj
    FROM arms CROSS JOIN pooled
    """


@gate("cuped_adjust", _cuped_sql())
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    x = _CU_X.format(lehmer=G.lehmer2("event_id"))
    base = ev.select(
        (F.col("user_id") % 2).alias("arm"),
        F.expr(_CU_Y).alias("y_q"),
        F.expr(x).alias("x_q"),
    )
    return cuped_adjust(base, "arm", "y_q", "x_q")

