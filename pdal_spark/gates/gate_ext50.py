"""Gate registry extension 50 — storage/crawl infrastructure batch:
content-defined chunking (Gear rolling hash, closed-form oracle),
redirect-chain resolution (pointer doubling vs recursive-CTE walk),
n-gram novelty vs a reference corpus, and the OOV-vs-vocab-size
curve."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate

# ---------------------------------------------------------------------------
# cdc_chunks — h_t = (2h + g) mod 2^32 == 32-char windowed hash, so
# the oracle evaluates the closed form with a 32-offset self-join.
# ---------------------------------------------------------------------------

_CDC_BITS = 6


def _cdc_sql() -> str:
    from pdal_spark.operators.dedup import CDC_GEAR_K, CDC_WIN

    k, win = CDC_GEAR_K, CDC_WIN
    return f"""
    WITH d AS MATERIALIZED (
      SELECT doc_id, text, length(text) AS n
      FROM documents WHERE doc_id % 5 = 0
    ),
    pos AS MATERIALIZED (
      SELECT doc_id, unnest(range(n)) AS t, text FROM d
    ),
    gv AS MATERIALIZED (
      SELECT doc_id, t,
             ((ord(substr(text, CAST(t + 1 AS INT), 1)) % 256) + 1)
               * {k} % {1 << 24} AS g
      FROM pos
    ),
    h AS (
      SELECT p.doc_id, p.t,
             CAST(sum(q.g * (CAST(1 AS BIGINT)
                  << CAST(p.t - q.t AS INT))) % {1 << 32}
                  AS BIGINT) AS h
      FROM gv p JOIN gv q
        ON q.doc_id = p.doc_id
       AND q.t BETWEEN p.t - {win - 1} AND p.t
      WHERE p.t >= {win - 1}
      GROUP BY 1, 2
    ),
    ends AS (
      SELECT doc_id, t FROM h WHERE h % {1 << _CDC_BITS} = 0
      UNION
      SELECT doc_id, n - 1 AS t FROM d WHERE n > 0
    ),
    ch AS (
      SELECT doc_id, t AS e,
             lag(t) OVER (PARTITION BY doc_id ORDER BY t)
               AS prev_e,
             row_number() OVER (PARTITION BY doc_id ORDER BY t) - 1
               AS chunk_idx
      FROM ends
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(coalesce(prev_e + 1, 0) AS BIGINT) AS start,
           CAST(e - coalesce(prev_e + 1, 0) + 1 AS BIGINT)
             AS length
    FROM ch
    """


@gate("cdc_chunks", _cdc_sql())
def q_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.dedup import cdc_chunks

    docs = _t(spark, sf_dir, "documents").where("doc_id % 5 = 0")
    return cdc_chunks(docs, mask_bits=_CDC_BITS)


# ---------------------------------------------------------------------------
# redirect_resolve — functional-graph contraction vs unrolled walk.
# ---------------------------------------------------------------------------

_RED_EDGES = """
  SELECT DISTINCT (event_id % 400) AS src,
         ((event_id % 400) * 17 + 3) % 400 AS dst
  FROM events WHERE (event_id % 400) % 7 <> 0
"""


def _redirect_sql() -> str:
    return f"""
    WITH e AS MATERIALIZED ({_RED_EDGES}),
    nodes AS (SELECT src AS url FROM e
              UNION SELECT dst FROM e),
    walk AS (
      WITH RECURSIVE r(url, cur, hops) AS (
        SELECT url, url, 0 FROM nodes
        UNION ALL
        SELECT r.url, e.dst, r.hops + 1
        FROM r JOIN e ON e.src = r.cur
        WHERE r.hops < 500
      )
      SELECT * FROM r
    ),
    resolved AS (
      SELECT url, cur AS terminal, hops FROM walk
      WHERE cur NOT IN (SELECT src FROM e)
    )
    SELECT n.url, res.terminal,
           CAST(coalesce(res.hops, -1) AS BIGINT) AS hops,
           res.terminal IS NULL AS is_cycle
    FROM nodes n LEFT JOIN resolved res ON res.url = n.url
    """


@gate("redirect_resolve", _redirect_sql())
def q_redirect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.graph import redirect_resolve

    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    edges = spark.sql(_RED_EDGES)
    return redirect_resolve(edges, max_rounds=10)


# ---------------------------------------------------------------------------
# ngram_novelty — odd docs scored against the even-doc 3-gram set.
# ---------------------------------------------------------------------------


def _novelty_sql() -> str:
    from pdal_spark.gate import _TOKS

    return f"""
    WITH tk AS MATERIALIZED (
      SELECT doc_id, pos, word FROM {_TOKS} t
    ),
    g AS MATERIALIZED (
      SELECT doc_id, word || ' ' || w2 || ' ' || w3 AS g FROM (
        SELECT doc_id, word,
               lead(word, 1) OVER (PARTITION BY doc_id
                                   ORDER BY pos) AS w2,
               lead(word, 2) OVER (PARTITION BY doc_id
                                   ORDER BY pos) AS w3
        FROM tk) x
      WHERE w3 IS NOT NULL
    ),
    ref AS (SELECT DISTINCT g FROM g WHERE doc_id % 2 = 0),
    sc AS (
      SELECT s.doc_id, s.g, r.g AS seen
      FROM g s LEFT JOIN ref r ON r.g = s.g
      WHERE s.doc_id % 2 = 1
    )
    SELECT doc_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN seen IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel
    FROM sc GROUP BY 1
    """


@gate("ngram_novelty", _novelty_sql())
def q_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import ngram_novelty

    docs = _t(spark, sf_dir, "documents")
    return ngram_novelty(
        docs.where("doc_id % 2 = 1"),
        docs.where("doc_id % 2 = 0"), n=3
    )


# ---------------------------------------------------------------------------
# oov_curve — coverage of top-k vocabularies.
# ---------------------------------------------------------------------------

_OOV_KS = [100, 1000, 5000]


def _oov_sql() -> str:
    from pdal_spark.gate import _TOKS

    ks = ", ".join(str(k) for k in _OOV_KS)
    return f"""
    WITH tk AS MATERIALIZED (
      SELECT word FROM {_TOKS} t
    ),
    cnt AS (SELECT word, count(*) AS c FROM tk GROUP BY 1),
    rk AS (
      SELECT word, c,
             row_number() OVER (ORDER BY c DESC, word ASC) AS r
      FROM cnt
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM cnt)
    SELECT k.vocab_k, tot.n_tokens,
           CAST(sum(CASE WHEN rk.r > k.vocab_k THEN rk.c
                    ELSE 0 END) AS BIGINT) AS n_oov
    FROM rk, (SELECT unnest([{ks}]) AS vocab_k) k, tot
    GROUP BY 1, 2
    """


@gate("oov_curve", _oov_sql())
def q_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import oov_curve

    return oov_curve(_t(spark, sf_dir, "documents"), _OOV_KS)
