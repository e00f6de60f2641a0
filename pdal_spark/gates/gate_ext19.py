"""Gate registry extension 19 — graph-similarity batch: neighborhood
Jaccard link prediction (the size-normalized sibling of Adamic-Adar,
brute-force wedge oracle) and TextRank keyword extraction (integer
PageRank over the word co-occurrence graph, unrolled-iteration
oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext12 import _EDGES_SQL, _edges
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import textops as ops_text

# ---------------------------------------------------------------------------
# neighbor_jaccard — same open-wedge enumeration as the adamic_adar
# oracle; score = (cn * Q) // (deg u + deg w - cn), all int64.
# ---------------------------------------------------------------------------

_NJ_SQL = f"""
    WITH {_EDGES_SQL},
    adj AS MATERIALIZED (
      SELECT lo AS v, hi AS n FROM e
      UNION ALL SELECT hi, lo FROM e
    ),
    pairs AS MATERIALIZED (
      SELECT a.n AS u, b.n AS w
      FROM adj a JOIN adj b ON b.v = a.v AND a.n < b.n
    ),
    open_p AS MATERIALIZED (
      SELECT p.u, p.w FROM pairs p
      ANTI JOIN e ON e.lo = p.u AND e.hi = p.w
    ),
    cn AS MATERIALIZED (
      SELECT u, w, count(*) AS cn FROM open_p GROUP BY u, w
    )
    SELECT cn.u, cn.w, cn.cn,
           (cn.cn * {ops_graph.JACC_Q}) // (du.degree + dw.degree - cn.cn)
             AS jacc_q
    FROM cn
    JOIN deg du ON du.node = cn.u
    JOIN deg dw ON dw.node = cn.w
"""


@gate("neighbor_jaccard", _NJ_SQL)
def q_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.neighbor_jaccard(_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# textrank_keywords — integer PageRank over adjacent non-stopword
# pairs; oracle unrolls the same truncating iterations.
# ---------------------------------------------------------------------------

_TR_ITERS = 3
_TR_K = 20
_TR_SCALE = 10**12
_TR_STOPS = ", ".join(repr(w) for w in ops_text.STOPWORDS)


def _textrank_sql(iters: int, k: int, scale: int) -> str:
    tele = (scale * 15) // 100
    parts = [f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, CAST(t.i AS BIGINT) AS pos, ws[t.i + 1] AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents) d,
           unnest(range(len(ws))) AS t(i)
    ),
    seq AS MATERIALIZED (
      SELECT doc_id, word,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS k
      FROM toks WHERE word NOT IN ({_TR_STOPS})
    ),
    e AS MATERIALIZED (
      SELECT DISTINCT least(a.word, b.word) AS lo,
                      greatest(a.word, b.word) AS hi
      FROM seq a JOIN seq b
        ON b.doc_id = a.doc_id AND b.k = a.k + 1
      WHERE a.word <> b.word
    ),
    adj AS MATERIALIZED (
      SELECT lo AS u, hi AS v FROM e UNION ALL SELECT hi, lo FROM e
    ),
    dg AS MATERIALIZED (SELECT u, count(*) AS d FROM adj GROUP BY u),
    n AS MATERIALIZED (SELECT DISTINCT u AS node FROM adj),
    r0 AS MATERIALIZED (
      SELECT node, CAST({scale} AS BIGINT) AS r FROM n
    )"""]
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(f""",
    r{i} AS MATERIALIZED (
      SELECT n.node,
             CAST({tele} AS BIGINT) + coalesce(s.in_r, 0) AS r
      FROM n LEFT JOIN (
        SELECT adj.v AS node,
               sum((p.r * 85) // (CAST(100 AS BIGINT) * dg.d)) AS in_r
        FROM adj JOIN dg ON dg.u = adj.u
                 JOIN {prev} p ON p.node = adj.u
        GROUP BY adj.v
      ) s ON s.node = n.node
    )""")
        prev = f"r{i}"
    parts.append(f"""
    SELECT node AS word, r AS rank_q FROM {prev}
    ORDER BY r DESC, node ASC LIMIT {k}
    """)
    return "".join(parts)


@gate("textrank_keywords", _textrank_sql(_TR_ITERS, _TR_K, _TR_SCALE))
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.textrank_keywords(
        docs, iters=_TR_ITERS, top_k=_TR_K, scale=_TR_SCALE
    )

