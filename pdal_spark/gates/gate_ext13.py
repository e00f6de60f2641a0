"""Gate registry extension 13 — graph-ML / corpus-selection suite:
Adamic-Adar link prediction, personalized PageRank (crawl-frontier
prioritization from a seed set), deterministic label-propagation
communities, and DSIR importance weights (target-tilted corpus
selection). Oracles are brute force (AA: enumerate every wedge and
anti-join the edge set) or the same unrolled integer iterations.

Graph gates reuse gate_ext12's edge fixture (src = id % 48,
dst = lehmer(id) % 48 on 1-in-19 events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext12 import _EDGES_SQL, _edges
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import textops as ops_text

_GN = 48
_GM = 19


# ---------------------------------------------------------------------------
# adamic_adar — oracle enumerates every open wedge pair brute-force
# and anti-joins the edge set; hash equality proves the engine's
# pair pipeline (and its integer 1/ln scoring) exact.
# ---------------------------------------------------------------------------

_AA_TERM = (
    f"CAST(floor({G.fnum(float(ops_graph.AA_Q))} /"
    " ln(CAST(degree AS DOUBLE))) AS BIGINT)"
)

_AA_SQL = f"""
    WITH {_EDGES_SQL},
    adj AS MATERIALIZED (
      SELECT lo AS v, hi AS n FROM e
      UNION ALL SELECT hi, lo FROM e
    ),
    ctr AS MATERIALIZED (
      SELECT adj.v, adj.n, deg.degree
      FROM adj JOIN deg ON deg.node = adj.v
    ),
    pairs AS MATERIALIZED (
      SELECT a.n AS u, b.n AS w, a.degree
      FROM ctr a JOIN ctr b ON b.v = a.v AND a.n < b.n
    ),
    open_p AS MATERIALIZED (
      SELECT p.u, p.w, {_AA_TERM} AS term_q
      FROM pairs p
      ANTI JOIN e ON e.lo = p.u AND e.hi = p.w
    )
    SELECT u, w, count(*) AS cn, sum(term_q) AS aa_q
    FROM open_p GROUP BY u, w
"""


@gate("adamic_adar", _AA_SQL)
def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.adamic_adar(_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# personalized_pagerank — TrustRank-style seeded teleport; both
# engines run the same unrolled int64 truncating iterations.
# ---------------------------------------------------------------------------

_PPR_SEEDS = [0, 7, 21]
_PPR_ITERS = 3
_PPR_SCALE = 10**12


def _ppr_sql(seeds: list[int], iters: int, scale: int) -> str:
    tele = (scale * 15) // 100
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
    dg AS MATERIALIZED (
      SELECT src, count(*) AS d FROM de GROUP BY src
    ),
    n AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM de UNION SELECT dst FROM de
      ) u
    ),
    r0 AS MATERIALIZED (
      SELECT node,
             CAST(CASE WHEN node IN ({seed_list})
                  THEN {scale} ELSE 0 END AS BIGINT) AS r
      FROM n
    )"""]
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(f""",
    r{i} AS MATERIALIZED (
      SELECT n.node,
             CAST(CASE WHEN n.node IN ({seed_list})
                  THEN {tele} ELSE 0 END AS BIGINT)
               + coalesce(s.in_r, 0) AS r
      FROM n LEFT JOIN (
        SELECT de.dst AS node,
               sum((p.r * 85) // (CAST(100 AS BIGINT) * dg.d)) AS in_r
        FROM de JOIN dg ON dg.src = de.src
                JOIN {prev} p ON p.node = de.src
        GROUP BY de.dst
      ) s ON s.node = n.node
    )""")
        prev = f"r{i}"
    parts.append(f"""
    SELECT node, r AS ppr FROM {prev}
    """)
    return "".join(parts)


@gate(
    "personalized_pagerank",
    _ppr_sql(_PPR_SEEDS, _PPR_ITERS, _PPR_SCALE),
)
def q_personalized_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return ops_graph.personalized_pagerank(
        _edges(spark, sf_dir),
        seeds=_PPR_SEEDS,
        iters=_PPR_ITERS,
        scale=_PPR_SCALE,
    )


# ---------------------------------------------------------------------------
# label_propagation — deterministic LPA (max-count neighbor label,
# smallest-label ties); unrolled round CTEs with the identical
# window argmax on both engines.
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _lpa_sql(rounds: int) -> str:
    parts = [f"""
    WITH {_EDGES_SQL},
    adj AS MATERIALIZED (
      SELECT lo AS node, hi AS nb FROM e
      UNION ALL SELECT hi, lo FROM e
    ),
    l0 AS MATERIALIZED (
      SELECT DISTINCT node, node AS lbl FROM adj
    )"""]
    prev = "l0"
    for i in range(1, rounds + 1):
        parts.append(f""",
    v{i} AS MATERIALIZED (
      SELECT adj.node, p.lbl, count(*) AS cnt
      FROM adj JOIN {prev} p ON p.node = adj.nb
      GROUP BY adj.node, p.lbl
    ),
    l{i} AS MATERIALIZED (
      SELECT node, lbl FROM (
        SELECT node, lbl, row_number() OVER (
          PARTITION BY node ORDER BY cnt DESC, lbl ASC
        ) AS rn FROM v{i}
      ) x WHERE rn = 1
    )""")
        prev = f"l{i}"
    parts.append(f"""
    SELECT node, lbl AS community FROM {prev}
    """)
    return "".join(parts)


@gate("label_propagation", _lpa_sql(_LPA_ROUNDS))
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.label_propagation(
        _edges(spark, sf_dir), rounds=_LPA_ROUNDS
    )


# ---------------------------------------------------------------------------
# dsir_weights — target = the English slice of the corpus; vocab
# (dense-rank) bucket ids so DuckDB mirrors the whole path; per-term
# quantized ln is the repo's cross-engine-exact convention.
# ---------------------------------------------------------------------------

_DSIR_B = 64

_DSIR_TOKS = """
  (SELECT doc_id, unnest(ws) AS word
   FROM (SELECT doc_id, string_split(text, ' ') AS ws
         FROM documents) d)
"""
_DSIR_VOCAB = """
  (SELECT word, row_number() OVER (ORDER BY word) AS word_id
   FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS word
         FROM documents) w)
"""


def _dsir_lnq(x: str) -> str:
    return (
        f"CAST(floor(ln(CAST({x} AS DOUBLE))"
        f" * {G.fnum(float(ops_text.DSIR_Q))}"
        f" + {G.fnum(0.5)}) AS BIGINT)"
    )


_DSIR_SQL = f"""
    WITH rawt AS MATERIALIZED (
      SELECT t.doc_id, ({G.mix_hash('v.word_id')}) % {_DSIR_B} AS b
      FROM {_DSIR_TOKS} t JOIN {_DSIR_VOCAB} v USING (word)
    ),
    tgtt AS MATERIALIZED (
      SELECT r.doc_id, r.b FROM rawt r
      JOIN documents d USING (doc_id) WHERE d.lang = 'en'
    ),
    rc AS (SELECT b, count(*) AS r_cnt FROM rawt GROUP BY b),
    tc AS (SELECT b, count(*) AS t_cnt FROM tgtt GROUP BY b),
    w AS MATERIALIZED (
      SELECT g.b,
             {_dsir_lnq(f"coalesce(tc.t_cnt, 0) + 1")}
           + {_dsir_lnq(f"(SELECT count(*) FROM rawt) + {_DSIR_B}")}
           - {_dsir_lnq(f"coalesce(rc.r_cnt, 0) + 1")}
           - {_dsir_lnq(f"(SELECT count(*) FROM tgtt) + {_DSIR_B}")}
             AS w_q
      FROM (SELECT range AS b FROM range(0, {_DSIR_B})) g
      LEFT JOIN rc ON rc.b = g.b
      LEFT JOIN tc ON tc.b = g.b
    )
    SELECT rawt.doc_id, count(*) AS n_tokens, sum(w.w_q) AS dsir_q
    FROM rawt JOIN w ON w.b = rawt.b
    GROUP BY rawt.doc_id
"""


@gate("dsir_weights", _DSIR_SQL)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_text.dsir_weights(
        docs,
        docs.where(F.col("lang") == "en"),
        buckets=_DSIR_B,
        vocab_df=v,
    )
