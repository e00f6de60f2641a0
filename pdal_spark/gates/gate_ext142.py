"""Gate registry extension 142 — spectral/sequence batch: Katz and
eigenvector centrality (fixed-point power iterations), Markov
entropy rate, Allan variance ladder."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext12 import _EDGES_SQL, _edges
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import temporal as ops_temporal

_ADJ = """
    adj AS MATERIALIZED (
      SELECT lo AS u, hi AS v FROM e
      UNION ALL SELECT hi, lo FROM e
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM adj)
"""

# ---------------------------------------------------------------------------
# katz_centrality — 3 unrolled truncating-div iterations
# ---------------------------------------------------------------------------
_KZ_S = ops_graph.KATZ_SCALE
_KZ_AN = ops_graph.KATZ_ALPHA_NUM
_KZ_AD = ops_graph.KATZ_ALPHA_DEN


def _katz_sql(iters: int) -> str:
    parts = [f"WITH {_EDGES_SQL}, {_ADJ},",
             f"it0 AS (SELECT node, CAST({_KZ_S} AS BIGINT) AS x"
             " FROM nodes)"]
    for i in range(1, iters + 1):
        parts.append(f""",
    it{i} AS MATERIALIZED (
      SELECT nodes.node,
             CAST({_KZ_S} + ({_KZ_AN} * coalesce(s.in_x, 0))
               // {_KZ_AD} AS BIGINT) AS x
      FROM nodes LEFT JOIN (
        SELECT adj.v AS node, CAST(sum(it{i - 1}.x) AS BIGINT)
          AS in_x
        FROM adj JOIN it{i - 1} ON adj.u = it{i - 1}.node
        GROUP BY adj.v
      ) s ON nodes.node = s.node
    )""")
    parts.append(
        f"\n    SELECT node, x AS katz_q FROM it{iters}"
    )
    return "".join(parts)


@gate("katz_centrality", _katz_sql(3))
def q_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.katz_centrality(_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# eigenvector_centrality — 3 max-normalized iterations
# ---------------------------------------------------------------------------


_EG_S = ops_graph.EIG_SCALE


def _eig_sql(iters: int) -> str:
    parts = [f"WITH {_EDGES_SQL}, {_ADJ},",
             f"it0 AS (SELECT node, CAST({_EG_S} AS BIGINT) AS x"
             " FROM nodes)"]
    for i in range(1, iters + 1):
        parts.append(f""",
    y{i} AS MATERIALIZED (
      SELECT adj.v AS node, CAST(sum(it{i - 1}.x) AS BIGINT) AS y
      FROM adj JOIN it{i - 1} ON adj.u = it{i - 1}.node
      GROUP BY adj.v
    ),
    m{i} AS (SELECT CAST(max(y) AS BIGINT) AS m FROM y{i}),
    it{i} AS MATERIALIZED (
      SELECT nodes.node,
             CAST((coalesce(y{i}.y, 0) * {_EG_S}) // m{i}.m
               AS BIGINT) AS x
      FROM nodes LEFT JOIN y{i} ON nodes.node = y{i}.node, m{i}
    )""")
    parts.append(
        f"\n    SELECT node, x AS eig_q FROM it{iters}"
    )
    return "".join(parts)


@gate("eigenvector_centrality", _eig_sql(3))
def q_eigenvector_centrality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return ops_graph.eigenvector_centrality(_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# markov_entropy — per-user event_type transition chain
# ---------------------------------------------------------------------------
_ME_Q = float(ops_temporal.MER_Q)
_ME_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT user_id AS k, event_id AS o, event_type AS st
      FROM events
    ),
    tr AS MATERIALIZED (
      SELECT st AS s,
             lead(st, 1) OVER (PARTITION BY k ORDER BY o) AS t
      FROM s
    ),
    cst AS (
      SELECT s, t, CAST(count(*) AS BIGINT) AS c_st
      FROM tr WHERE t IS NOT NULL GROUP BY s, t
    ),
    cs AS (
      SELECT s, CAST(sum(c_st) AS BIGINT) AS c_s
      FROM cst GROUP BY s
    ),
    terms AS (
      SELECT c_st,
             CAST(floor(ln(cast(c_s as double)
               / cast(c_st as double))
               * {_ME_Q!r}e0 + 0.5e0) AS BIGINT) AS lnq
      FROM cst JOIN cs USING (s)
    ),
    agg AS (
      SELECT CAST(sum(c_st) AS BIGINT) AS n_transitions,
             CAST(sum(c_st * lnq) AS BIGINT) AS h_q_sum
      FROM terms
    ),
    ns AS (
      SELECT CAST(count(DISTINCT s) AS BIGINT) AS n_states FROM cst
    )
    SELECT n_transitions, n_states, h_q_sum,
           CASE WHEN n_transitions > 0 THEN
             cast(h_q_sum as double)
             / (cast(n_transitions as double) * {_ME_Q!r}e0) END
             AS h
    FROM agg, ns
"""


@gate("markov_entropy", _ME_SQL)
def q_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), F.col("event_id").alias("o"),
        F.col("event_type").alias("st"),
    )
    return ops_temporal.markov_entropy_rate(
        ev, key="k", order="o", state="st"
    )


# ---------------------------------------------------------------------------
# allan_variance — tau ladder over the event_id-ordered value series
# ---------------------------------------------------------------------------
_AV_TAUS = [4, 16, 64]
_AV_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT v,
             CAST(row_number() OVER (ORDER BY o ASC) AS BIGINT) - 1
               AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM s
    ),
    ladder AS (
      SELECT v, rn, CAST(t.tau AS BIGINT) AS tau
      FROM base,
           (SELECT unnest([{", ".join(map(str, _AV_TAUS))}]) AS tau)
             t
      WHERE rn < (n // t.tau) * t.tau
    ),
    bins AS (
      SELECT tau, rn // tau AS b, CAST(sum(v) AS BIGINT) AS s_i
      FROM ladder GROUP BY tau, rn // tau
    ),
    diffs AS (
      SELECT tau, s_i,
             lag(s_i, 1) OVER (PARTITION BY tau ORDER BY b)
               AS prev
      FROM bins
    ),
    agg AS (
      SELECT tau, CAST(count(*) + 1 AS BIGINT) AS m_bins,
             CAST(sum((s_i - prev) * (s_i - prev)) AS BIGINT)
               AS sum_sq
      FROM diffs WHERE prev IS NOT NULL GROUP BY tau
    )
    SELECT tau, m_bins, sum_sq,
           CASE WHEN m_bins > 1 THEN cast(sum_sq as double)
             / (2.0e0 * (cast(m_bins as double) - 1.0e0)
             * cast(tau as double) * cast(tau as double)) END
             AS avar
    FROM agg
"""


@gate("allan_variance", _AV_SQL)
def q_allan_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.allan_variance(
        ev, order="o", value="v", taus=_AV_TAUS
    )
