"""Gate registry extension 14 — sketch/decay/projection suite:
Johnson-Lindenstrauss sign random projection of quantized embeddings,
KMV distinct sketches + KMV Jaccard/intersection set-op estimates,
integer exponential-decay counters, and seeded BFS crawl-depth
levels. Every op is integer-exact (shifts / truncating div / sign
sums), so all oracles are full value-hash mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import similarity as ops_sim
from pdal_spark.operators import sketch as ops_sk
from pdal_spark.operators import temporal as ops_tmp

_GN = 48
_GM = 19


# ---------------------------------------------------------------------------
# rp_sketch — the projection signs come from the shared mix_hash
# arithmetic, so DuckDB regenerates the same matrix from the formula
# while Spark bakes it into the plan as literals.
# ---------------------------------------------------------------------------

_RP_K = 16
_RP_QMAX = 127

_RP_QZ = f"""
  (SELECT vec_id,
          list_transform(v, x -> round(x * {_RP_QMAX} / m)) AS qv
   FROM (SELECT vec_id, v,
                list_max(list_transform(v, x -> abs(x))) AS m
         FROM (SELECT vec_id, cast(embedding as double[]) AS v
               FROM embeddings) r) s)
"""

_RP_SQL = f"""
    WITH t AS MATERIALIZED (
      SELECT vec_id, unnest(qv) AS x,
             unnest(range(0, len(qv))) AS i
      FROM {_RP_QZ} z
    )
    SELECT t.vec_id, CAST(g.j AS INT) AS j,
           CAST(sum(t.x * (1 - 2 *
             ({G.mix_hash(f'(t.i * {_RP_K} + g.j)')} % 2)))
             AS BIGINT) AS rp_q
    FROM t, (SELECT range AS j FROM range(0, {_RP_K})) g
    GROUP BY t.vec_id, g.j
"""


@gate("rp_sketch", _RP_SQL)
def q_rp_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return ops_sim.rp_sketch(emb, out_dim=_RP_K, dims=64, bits=8)


# ---------------------------------------------------------------------------
# KMV sketches over a synthetic item universe (event_id % 501):
# per-event-type distinct estimates, then the Jaccard/intersection
# estimator between the click and purchase item sets.
# ---------------------------------------------------------------------------

_KMV_K = 32
_KMV_MOD = 501

_KMV_ITEMS = f"""
  (SELECT event_type, (event_id % {_KMV_MOD}) AS item FROM events)
"""


_KMV_SQL = f"""
    WITH hs AS MATERIALIZED (
      SELECT DISTINCT event_type AS grp,
             {G.mix_hash('item')} AS h
      FROM {_KMV_ITEMS} it
    ),
    kept AS MATERIALIZED (
      SELECT grp, h FROM (
        SELECT grp, h, row_number() OVER (
          PARTITION BY grp ORDER BY h ASC
        ) AS rk FROM hs
      ) x WHERE rk <= {_KMV_K}
    )
    SELECT grp AS event_type,
           count(*) AS n_kept,
           max(h) AS kth_hash,
           CASE WHEN count(*) >= {_KMV_K}
             THEN (CAST({_KMV_K - 1} AS BIGINT) * {G.M31}) // max(h)
             ELSE count(*) END AS est_q
    FROM kept GROUP BY grp
"""


@gate("kmv_distinct", _KMV_SQL)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("event_id") % _KMV_MOD).alias("item")
    )
    return ops_sk.kmv_sketch(ev, group="event_type", elem="item",
                             k=_KMV_K)


_KMVJ_SQL = f"""
    WITH sides AS MATERIALIZED (
      SELECT {G.mix_hash('item')} AS h,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS in_a,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS in_b
      FROM {_KMV_ITEMS} it
      WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ),
    kept AS MATERIALIZED (
      SELECT h, in_a, in_b FROM sides ORDER BY h ASC LIMIT {_KMV_K}
    ),
    agg AS (
      SELECT count(*) AS n_union_kept,
             max(h) AS union_kth,
             CAST(sum(in_a * in_b) AS BIGINT) AS matches
      FROM kept
    )
    SELECT n_union_kept, union_kth,
           CASE WHEN n_union_kept >= {_KMV_K}
             THEN (CAST({_KMV_K - 1} AS BIGINT) * {G.M31}) // union_kth
             ELSE CAST(n_union_kept AS BIGINT) END AS union_est_q,
           matches,
           (matches * {ops_sk.KMV_JACC_Q}) // n_union_kept AS jaccard_q,
           (matches * (CASE WHEN n_union_kept >= {_KMV_K}
             THEN (CAST({_KMV_K - 1} AS BIGINT) * {G.M31}) // union_kth
             ELSE CAST(n_union_kept AS BIGINT) END)) // n_union_kept
             AS inter_est_q
    FROM agg
"""


@gate("kmv_jaccard", _KMVJ_SQL)
def q_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("event_id") % _KMV_MOD).alias("item")
    )
    return ops_sk.kmv_jaccard(
        ev, group="event_type", elem="item",
        ga="click", gb="purchase", k=_KMV_K,
    )


# ---------------------------------------------------------------------------
# decayed_counts — integer halving per full halflife of age; ref
# pinned to a constant so both engines see identical ages.
# ---------------------------------------------------------------------------

_DC_REF = "2024-02-01 00:00:00"
_DC_HL = 3 * 86400

_DC_SQL = f"""
    SELECT event_type,
           count(*) AS n_events,
           sum(
             ({1 << ops_tmp.DECAY_W_BITS} >> CAST(
               greatest(0, least(
                 (epoch_us(TIMESTAMP '{_DC_REF}') - epoch_us(ts))
                   // {_DC_HL * 1_000_000}, 62)) AS INT))
             * CAST(floor(value * 1000e0) AS BIGINT)
           ) AS decayed_q
    FROM events GROUP BY event_type
"""


@gate("decayed_counts", _DC_SQL)
def q_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts",
        F.expr(f"cast(floor(value * {G.fnum(1000.0)}) as bigint)")
        .alias("v_mill"),
        F.lit(_DC_REF).cast("timestamp").alias("__ref"),
    )
    return ops_tmp.decayed_counts(
        ev, key="event_type", ref_ts="__ref",
        halflife_s=_DC_HL, ts="ts", value="v_mill",
    )


# ---------------------------------------------------------------------------
# bfs_levels — crawl depth from seed node 0 over the directed
# domain-graph fixture; oracle accumulates the visited set through
# unrolled round CTEs.
# ---------------------------------------------------------------------------

_BFS_SEEDS = [0]
_BFS_DEPTH = 3


def _bfs_sql(seeds: list[int], depth: int) -> str:
    seed_list = ", ".join(str(s) for s in seeds)
    parts = [f"""
    WITH raw AS MATERIALIZED (
      SELECT (event_id % {_GN}) AS src,
             ({G.lehmer2('event_id')} % {_GN}) AS dst
      FROM events WHERE event_id % {_GM} = 0
    ),
    de AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM raw WHERE src <> dst
    ),
    n AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM de UNION SELECT dst FROM de
      ) u
    ),
    f0 AS MATERIALIZED (
      SELECT node FROM n WHERE node IN ({seed_list})
    ),
    v0 AS MATERIALIZED (
      SELECT node, 0 AS level FROM f0
    )"""]
    for i in range(1, depth + 1):
        parts.append(f""",
    f{i} AS MATERIALIZED (
      SELECT DISTINCT de.dst AS node
      FROM de JOIN f{i - 1} p ON p.node = de.src
      ANTI JOIN v{i - 1} vv ON vv.node = de.dst
    ),
    v{i} AS MATERIALIZED (
      SELECT node, level FROM v{i - 1}
      UNION ALL SELECT node, {i} AS level FROM f{i}
    )""")
    parts.append(f"""
    SELECT node, CAST(level AS INT) AS level FROM v{depth}
    """)
    return "".join(parts)


@gate("bfs_levels", _bfs_sql(_BFS_SEEDS, _BFS_DEPTH))
def q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.gates.gate_ext12 import _edges

    return ops_graph.bfs_levels(
        _edges(spark, sf_dir),
        seeds=_BFS_SEEDS,
        max_depth=_BFS_DEPTH,
        directed=True,
    )
