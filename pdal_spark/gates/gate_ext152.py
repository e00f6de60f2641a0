"""Gate registry extension 152 — series-structure batch: matrix
profile (exclusion-zone subsequence NN) and binary-segmentation
best split."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# matrix_profile — w=8 subsequences over a 345-row slice
# ---------------------------------------------------------------------------
_MP_W = 8
_MP_PRED = "event_id % 29 = 0"
_MP_ENC = ops_temporal.MP_ENC
_MP_D2 = " + ".join(
    f"(a.vec[{k}] - b.vec[{k}]) * (a.vec[{k}] - b.vec[{k}])"
    for k in range(1, _MP_W + 1)
)
_MP_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST(floor(value) AS BIGINT) AS v
      FROM events WHERE {_MP_PRED}
    ),
    sub AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY o ASC) AS BIGINT)
               AS i,
             array_agg(v) OVER (ORDER BY o ASC
               ROWS BETWEEN CURRENT ROW AND {_MP_W - 1} FOLLOWING)
               AS vec
      FROM s
    ),
    subf AS MATERIALIZED (
      SELECT i, vec FROM sub WHERE len(vec) = {_MP_W}
    ),
    pairs AS MATERIALIZED (
      SELECT a.i AS ia, b.i AS ib,
             CAST({_MP_D2} AS BIGINT) AS d2
      FROM subf a JOIN subf b ON b.i >= a.i + {_MP_W}
    ),
    mirrored AS (
      SELECT ia AS i,
             d2 * CAST({_MP_ENC} AS BIGINT) + ib AS enc
      FROM pairs
      UNION ALL
      SELECT ib, d2 * CAST({_MP_ENC} AS BIGINT) + ia FROM pairs
    ),
    prof AS (
      SELECT i, CAST(min(enc) AS BIGINT) AS mn
      FROM mirrored GROUP BY i
    )
    SELECT i, CAST(mn // {_MP_ENC} AS BIGINT) AS mp_d2,
           CAST(mn % {_MP_ENC} AS BIGINT) AS mp_j
    FROM prof
"""


@gate("matrix_profile", _MP_SQL)
def q_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(_MP_PRED).select(
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.matrix_profile(
        ev, order="o", value="v", w=_MP_W
    )


# ---------------------------------------------------------------------------
# binseg_split — best SSE split of the ordered value series
# ---------------------------------------------------------------------------
_BS_Q = ops_temporal.BS_Q


def _bs_qdiv(d: str, nn: str) -> str:
    return (
        f"(({d}) // ({nn})) * CAST({_BS_Q} AS BIGINT)"
        f" + ((({d}) % ({nn})) * CAST({_BS_Q} AS BIGINT))"
        f" // ({nn})"
    )


_BS_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY o ASC) AS BIGINT)
               AS t,
             CAST(sum(v) OVER (ORDER BY o ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
             CAST(sum(v * v) OVER (ORDER BY o ASC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pp,
             CAST(count(*) OVER () AS BIGINT) AS n,
             CAST(sum(v) OVER () AS BIGINT) AS s_all,
             CAST(sum(v * v) OVER () AS BIGINT) AS ss_all
      FROM s
    ),
    cand AS MATERIALIZED (
      SELECT t, p, n, s_all,
             CAST(pp * CAST({_BS_Q} AS BIGINT)
               - ({_bs_qdiv('p * p', 't')})
               + (ss_all - pp) * CAST({_BS_Q} AS BIGINT)
               - ({_bs_qdiv('(s_all - p) * (s_all - p)',
                            'n - t')})
               AS BIGINT) AS cost_q
      FROM base WHERE t < n
    ),
    mn AS (SELECT CAST(min(cost_q) AS BIGINT) AS mc FROM cand),
    best AS (
      SELECT n, mc, CAST(min(t) AS BIGINT) AS t_star
      FROM cand, mn WHERE cand.cost_q = mn.mc
      GROUP BY n, mc
    )
    SELECT best.n, t_star, mc AS cost_q,
           cast(cand.p as double) / cast(t_star as double)
             AS mean_l,
           cast(cand.s_all - cand.p as double)
             / cast(best.n - t_star as double) AS mean_r
    FROM best JOIN cand ON cand.t = best.t_star
"""


@gate("binseg_split", _BS_SQL)
def q_binseg_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.binseg_split(ev, order="o", value="v")
