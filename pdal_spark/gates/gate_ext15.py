"""Gate registry extension 15 — moments / PCA statistic / walk
corpus / association mining: AMS F2 sketch (self-join-size & skew
estimator), the quantized Gram matrix (PCA's distributed sufficient
statistic), deterministic DeepWalk-style random walks, and
market-basket co-occurrence with lift. All integer-exact; the walk
oracle replays the identical hash-indexed neighbor picks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import similarity as ops_sim
from pdal_spark.operators import sketch as ops_sk
from pdal_spark.operators import stats as ops_stats

_GN = 48
_GM = 19


# ---------------------------------------------------------------------------
# ams_f2 — the sign sums replay exactly; median rank is total.
# ---------------------------------------------------------------------------

_F2_T = 16
_F2_MOD = 501

_F2_SQL = f"""
    WITH it AS MATERIALIZED (
      SELECT (event_id % {_F2_MOD}) AS e FROM events
    ),
    sgn AS MATERIALIZED (
      SELECT g.i,
             (1 - 2 * ({G.mix_hash('(it.e * 53 + g.i)')} % 2)) AS s
      FROM it, (SELECT range AS i FROM range(0, {_F2_T})) g
    ),
    est AS (
      SELECT i, CAST(sum(s) * sum(s) AS BIGINT) AS f2
      FROM sgn GROUP BY i
    ),
    rk AS (
      SELECT f2, row_number() OVER (ORDER BY f2 ASC, i ASC) AS r
      FROM est
    )
    SELECT max(CASE WHEN r = {(_F2_T + 1) // 2} THEN f2 END)
             AS f2_med,
           sum(f2) // {_F2_T} AS f2_mean,
           CAST({_F2_T} AS INT) AS t
    FROM rk
"""


@gate("ams_f2", _F2_SQL)
def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % _F2_MOD).alias("item")
    )
    return ops_sk.ams_f2(ev, elem="item", t=_F2_T)


# ---------------------------------------------------------------------------
# gram_matrix — upper triangle + dim sums + count, the one-pass PCA
# statistic; oracle is the quantized self-join.
# ---------------------------------------------------------------------------

_GM_QMAX = 127

_GM_QZ = f"""
  (SELECT vec_id,
          list_transform(v, x -> round(x * {_GM_QMAX} / m)) AS qv
   FROM (SELECT vec_id, v,
                list_max(list_transform(v, x -> abs(x))) AS m
         FROM (SELECT vec_id, cast(embedding as double[]) AS v
               FROM embeddings) r) s)
"""

_GM_SQL = f"""
    WITH t AS MATERIALIZED (
      SELECT vec_id, unnest(qv) AS x,
             unnest(range(0, len(qv))) AS i
      FROM {_GM_QZ} z
    )
    SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
           CAST(sum(a.x * b.x) AS BIGINT) AS g_q
    FROM t a JOIN t b ON b.vec_id = a.vec_id AND b.i >= a.i
    GROUP BY 1, 2
    UNION ALL
    SELECT CAST(i AS INT), -1, CAST(sum(x) AS BIGINT) FROM t GROUP BY 1
    UNION ALL
    SELECT -1, -1, count(*) FROM {_GM_QZ} z2
"""


@gate("gram_matrix", _GM_SQL)
def q_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return ops_sim.gram_matrix(emb, dims=64, bits=8)


# ---------------------------------------------------------------------------
# random_walks — hash-indexed neighbor picks over sorted adjacency
# arrays; the oracle indexes the identical DuckDB lists.
# ---------------------------------------------------------------------------

_RW_STEPS = 3


def _rw_sql(steps: int) -> str:
    parts = [f"""
    WITH raw AS MATERIALIZED (
      SELECT (event_id % {_GN}) AS src,
             ({G.lehmer2('event_id')} % {_GN}) AS dst
      FROM events WHERE event_id % {_GM} = 0
    ),
    de AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM raw WHERE src <> dst
    ),
    adj AS MATERIALIZED (
      SELECT src AS a, list(dst ORDER BY dst) AS nbrs
      FROM de GROUP BY src
    ),
    n AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM de UNION SELECT dst FROM de
      ) u
    ),
    c0 AS MATERIALIZED (
      SELECT node AS walk_id, node FROM n
    )"""]
    for s in range(1, steps + 1):
        pick = G.mix_hash(f"(p.walk_id * {ops_graph.RW_MIX} + {s})")
        parts.append(f""",
    c{s} AS MATERIALIZED (
      SELECT p.walk_id,
             adj.nbrs[CAST(({pick}) % len(adj.nbrs) AS INT) + 1]
               AS node
      FROM c{s - 1} p JOIN adj ON adj.a = p.node
    )""")
    sel = ["SELECT walk_id, CAST(0 AS INT) AS step, node FROM c0"]
    for s in range(1, steps + 1):
        sel.append(
            f"SELECT walk_id, CAST({s} AS INT) AS step, node FROM c{s}"
        )
    parts.append("\n    " + "\n    UNION ALL ".join(sel))
    return "".join(parts)


@gate("random_walks", _rw_sql(_RW_STEPS))
def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.gates.gate_ext12 import _edges

    return ops_graph.random_walks(
        _edges(spark, sf_dir), steps=_RW_STEPS, n_walks=1,
        directed=True,
    )


# ---------------------------------------------------------------------------
# cooccurrence — baskets = users, items = a synthetic catalog slice.
# ---------------------------------------------------------------------------

_CO_MOD = 97
_CO_MIN = 3

_CO_SQL = f"""
    WITH b AS MATERIALIZED (
      SELECT DISTINCT user_id AS k, (event_id % {_CO_MOD}) AS it
      FROM events
    ),
    ik AS MATERIALIZED (SELECT it, count(*) AS c FROM b GROUP BY it),
    nk AS (SELECT count(DISTINCT k) AS n_keys FROM b),
    p AS MATERIALIZED (
      SELECT a.it AS item_a, bb.it AS item_b,
             count(*) AS pair_keys
      FROM b a JOIN b bb ON bb.k = a.k AND a.it < bb.it
      GROUP BY 1, 2 HAVING count(*) >= {_CO_MIN}
    )
    SELECT item_a, item_b,
           CAST(pair_keys AS BIGINT) AS pair_keys,
           CAST((pair_keys * nk.n_keys * {ops_stats.LIFT_Q})
             // (ca.c * cb.c) AS BIGINT) AS lift_q
    FROM p
    JOIN ik ca ON ca.it = p.item_a
    JOIN ik cb ON cb.it = p.item_b, nk
"""


@gate("cooccurrence", _CO_SQL)
def q_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", (F.col("event_id") % _CO_MOD).alias("item")
    )
    return ops_stats.cooccurrence(
        ev, key="user_id", item="item", min_count=_CO_MIN
    )
