"""Gate registry extension 23 — overlay-join & LM-ladder batch:
rectangle-intersection join (responsibility-deduped cell join; oracle
= brute-force interval predicate), trigram stupid-backoff LM (the
KenLM order above bigram_logprob), and keyword-in-context snippets
(row-local substring context).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import overlay as ops_overlay
from pdal_spark.operators import textops as ops_text

# ---------------------------------------------------------------------------
# bbox_join — deterministic box fixtures derived from the geocode;
# the oracle is the raw interval predicate over all pairs, so hash
# equality proves the cell join + responsibility dedup exact.
# ---------------------------------------------------------------------------

_BJ_LM, _BJ_RM = 11, 13
_BJ_CELL = 4.0


def _box_sql(mod: int, idn: str, grow: float) -> str:
    lat, lon = G.geo_lat("event_id"), G.geo_lon("event_id")
    w = f"({G.fnum(0.3)} + (event_id % 17) * {G.fnum(grow)})"
    h = f"({G.fnum(0.2)} + (event_id % 23) * {G.fnum(grow / 2)})"
    return f"""
      SELECT event_id AS {idn},
             {lon} - {w} AS x0, {lon} + {w} AS x1,
             {lat} - {h} AS y0, {lat} + {h} AS y1
      FROM events WHERE event_id % {mod} = 0
    """


_BJ_SQL = f"""
    WITH lb AS MATERIALIZED ({_box_sql(_BJ_LM, 'lid', 0.11)}),
    rb AS MATERIALIZED ({_box_sql(_BJ_RM, 'rid', 0.07)})
    SELECT l.lid, r.rid
    FROM lb l JOIN rb r
      ON l.x0 <= r.x1 AND r.x0 <= l.x1
     AND l.y0 <= r.y1 AND r.y0 <= l.y1
"""


def _boxes(spark: SparkSession, sf_dir: str, mod: int, idn: str,
           grow: float) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") % mod == 0)
    lat, lon = G.geo_lat("event_id"), G.geo_lon("event_id")
    w = f"({G.fnum(0.3)} + (event_id % 17) * {G.fnum(grow)})"
    h = f"({G.fnum(0.2)} + (event_id % 23) * {G.fnum(grow / 2)})"
    return ev.select(
        F.col("event_id").alias(idn),
        F.expr(f"{lon} - {w}").alias("x0"),
        F.expr(f"{lon} + {w}").alias("x1"),
        F.expr(f"{lat} - {h}").alias("y0"),
        F.expr(f"{lat} + {h}").alias("y1"),
    )


@gate("bbox_join", _BJ_SQL)
def q_bbox_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    lb = _boxes(spark, sf_dir, _BJ_LM, "lid", 0.11)
    rb = _boxes(spark, sf_dir, _BJ_RM, "rid", 0.07)
    return ops_overlay.bbox_join(lb, rb, cell=_BJ_CELL)


# ---------------------------------------------------------------------------
# trigram_logprob — train on even doc_ids, score odd ones, so both
# backoff levels fire.
# ---------------------------------------------------------------------------

_T3_TOKS = """
      SELECT doc_id, CAST(t.i AS BIGINT) AS pos, ws[t.i + 1] AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS ws
            FROM {src}) d,
           unnest(range(len(ws))) AS t(i)
"""

_LNQ = G.fnum(float(ops_text.LM_Q))
_BO = G.fnum(0.4)
_BO2 = G.fnum(0.4 * 0.4)

_T3_SQL = f"""
    WITH traint AS MATERIALIZED (
      {_T3_TOKS.format(src="(SELECT * FROM documents WHERE doc_id % 2 = 0) tr")}
    ),
    scoret AS MATERIALIZED (
      {_T3_TOKS.format(src="(SELECT * FROM documents WHERE doc_id % 2 = 1) sc")}
    ),
    c1 AS MATERIALIZED (
      SELECT word, count(*) AS c1 FROM traint GROUP BY word
    ),
    tot AS (
      SELECT count(*) AS n_total, count(DISTINCT word) AS n_vocab
      FROM traint
    ),
    c2 AS MATERIALIZED (
      SELECT a.word AS w1, b.word AS w2, count(*) AS c2
      FROM traint a JOIN traint b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2
    ),
    c3 AS MATERIALIZED (
      SELECT a.word AS w1, b.word AS w2, c.word AS w3, count(*) AS c3
      FROM traint a
      JOIN traint b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN traint c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
      GROUP BY 1, 2, 3
    ),
    tg AS MATERIALIZED (
      SELECT a.doc_id, a.word AS w1, b.word AS w2, c.word AS w3
      FROM scoret a
      JOIN scoret b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN scoret c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
    ),
    scored AS (
      SELECT tg.doc_id,
        CASE WHEN c3.c3 IS NOT NULL THEN
          CAST(floor(ln(CAST(c3.c3 AS DOUBLE) / CAST(c2.c2 AS DOUBLE))
            * {_LNQ} + {G.fnum(0.5)}) AS BIGINT)
        WHEN c2b.c2 IS NOT NULL THEN
          CAST(floor(ln({_BO} * CAST(c2b.c2 AS DOUBLE)
            / CAST(c1b.c1 AS DOUBLE))
            * {_LNQ} + {G.fnum(0.5)}) AS BIGINT)
        ELSE
          CAST(floor(ln({_BO2} * CAST(coalesce(c1c.c1, 0) + 1 AS DOUBLE)
            / CAST(tot.n_total + tot.n_vocab AS DOUBLE))
            * {_LNQ} + {G.fnum(0.5)}) AS BIGINT)
        END AS term_q
      FROM tg
      LEFT JOIN c3 ON c3.w1 = tg.w1 AND c3.w2 = tg.w2 AND c3.w3 = tg.w3
      LEFT JOIN c2 ON c2.w1 = tg.w1 AND c2.w2 = tg.w2
      LEFT JOIN c2 c2b ON c2b.w1 = tg.w2 AND c2b.w2 = tg.w3
      LEFT JOIN c1 c1b ON c1b.word = tg.w2
      LEFT JOIN c1 c1c ON c1c.word = tg.w3
      CROSS JOIN tot
    )
    SELECT doc_id, count(*) AS n_trigrams, sum(term_q) AS lm3_q,
           round((CAST(sum(term_q) AS DOUBLE) / {_LNQ})
             / count(*), 6) AS lm3_mean
    FROM scored GROUP BY doc_id
"""


@gate("trigram_backoff", _T3_SQL)
def q_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 2 == 0)
    score = docs.where(F.col("doc_id") % 2 == 1)
    return ops_text.trigram_logprob(score, train_df=train)


# ---------------------------------------------------------------------------
# kwic_snippets — substring context window, pure string ops.
# ---------------------------------------------------------------------------

_KW_TERM = "spark"
_KW_W = 25

_KW_SQL = f"""
    SELECT doc_id,
           CAST(strpos(text, '{_KW_TERM}') AS INT) AS first_pos,
           CAST((length(text) - length(replace(text, '{_KW_TERM}', '')))
             // {len(_KW_TERM)} AS INT) AS n_matches,
           substr(text, greatest(1, strpos(text, '{_KW_TERM}') - {_KW_W}),
                  {_KW_W * 2 + len(_KW_TERM)}) AS snippet
    FROM documents
    WHERE strpos(text, '{_KW_TERM}') > 0
"""


@gate("kwic_snippets", _KW_SQL)
def q_kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.kwic_snippets(docs, _KW_TERM, width=_KW_W)

