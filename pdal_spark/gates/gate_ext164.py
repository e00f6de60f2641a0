"""Gate registry extension 164 — weighted-profile similarity
joins: Ruzicka (weighted Jaccard) and exact sparse cosine.
Brute-force-free: the shared-dim identity makes both lossless."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import similarity as ops_sim

# profiles: 50 user entities x hashed item dims with small counts
_WP_E = "(user_id % 50)"
_WP_D = f"(CAST({G.lehmer2('event_id')} % 40 AS BIGINT))"
_WP_BASE = f"""
    base AS MATERIALIZED (
      SELECT {_WP_E} AS e, {_WP_D} AS d,
             CAST(count(*) AS BIGINT) AS w
      FROM events GROUP BY 1, 2
    )
"""

_RZ_Q = ops_sim.RUZ_Q
_RZ_MIN = _RZ_Q // 4
_RZ_SQL = f"""
    WITH {_WP_BASE},
    tot AS (SELECT e, CAST(sum(w) AS BIGINT) AS t
            FROM base GROUP BY e),
    shared AS (
      SELECT a.e AS ea, b.e AS eb,
             CAST(sum(least(a.w, b.w)) AS BIGINT) AS sum_min
      FROM base a JOIN base b ON a.d = b.d AND a.e < b.e
      GROUP BY a.e, b.e
    ),
    j AS (
      SELECT ea, eb, sum_min,
             CAST(ta.t + tb.t - sum_min AS BIGINT) AS sum_max
      FROM shared
      JOIN tot ta ON ta.e = shared.ea
      JOIN tot tb ON tb.e = shared.eb
    )
    SELECT ea, eb, sum_min, sum_max,
           CAST((sum_min * CAST({_RZ_Q} AS BIGINT)) // sum_max
             AS BIGINT) AS sim_q
    FROM j
    WHERE (sum_min * CAST({_RZ_Q} AS BIGINT)) // sum_max
      >= {_RZ_MIN}
"""


@gate("ruzicka_join", _RZ_SQL)
def q_ruzicka_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    prof = _t(spark, sf_dir, "events").groupBy(
        F.expr(_WP_E).alias("e"),
        F.expr(
            f"cast({G.lehmer2('event_id')} % 40 as bigint)"
        ).alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("w"))
    return ops_sim.ruzicka_join(
        prof, entity="e", dim="d", weight="w", min_sim_q=_RZ_MIN
    )


_SC_MIN = 400_000  # cos >= 0.4 (sf0.001-sized: sparser profiles)
_SC_SQL = f"""
    WITH {_WP_BASE},
    norms AS (SELECT e, CAST(sum(w * w) AS BIGINT) AS n2
              FROM base GROUP BY e),
    dots AS (
      SELECT a.e AS ea, b.e AS eb,
             CAST(sum(a.w * b.w) AS BIGINT) AS dot
      FROM base a JOIN base b ON a.d = b.d AND a.e < b.e
      GROUP BY a.e, b.e
    ),
    j AS (
      SELECT ea, eb, dot, na.n2 AS na2, nb.n2 AS nb2,
             CAST(floor(cast(dot as double)
               / sqrt(cast(na.n2 as double)
               * cast(nb.n2 as double))
               * 1000000.0e0 + 0.5e0) AS BIGINT) AS cos_q
      FROM dots
      JOIN norms na ON na.e = dots.ea
      JOIN norms nb ON nb.e = dots.eb
    )
    SELECT ea, eb, dot, na2, nb2, cos_q
    FROM j WHERE cos_q >= {_SC_MIN}
"""


@gate("sparse_cosine_join", _SC_SQL)
def q_sparse_cosine_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    prof = _t(spark, sf_dir, "events").groupBy(
        F.expr(_WP_E).alias("e"),
        F.expr(
            f"cast({G.lehmer2('event_id')} % 40 as bigint)"
        ).alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("w"))
    return ops_sim.sparse_cosine_join(
        prof, entity="e", dim="d", weight="w",
        min_cos_1e6=_SC_MIN,
    )
