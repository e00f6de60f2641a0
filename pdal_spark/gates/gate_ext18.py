"""Gate registry extension 18 — keyphrase / positional-retrieval /
corpus-diagnostic batch: RAKE keyphrase extraction (pure-integer
deg/freq scoring), exact positional phrase search (the consecutive-
token complement of bm25's bag-of-words), and the Zipf rank-frequency
OLS fit (quantized-ln integer moments, one exact IEEE division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import textops as ops_text

# Shared positional-token CTE (DuckDB): 0-based pos like
# operators.textops.tokens.
_TOKS = """
    toks AS MATERIALIZED (
      SELECT doc_id, CAST(t.i AS BIGINT) AS pos, ws[t.i + 1] AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents) d,
           unnest(range(len(ws))) AS t(i)
    )
"""

# ---------------------------------------------------------------------------
# rake_keywords — stopword-run candidate phrases, integer deg/freq
# word scores, distinct corpus top-k.
# ---------------------------------------------------------------------------

_RAKE_K = 15
_STOPS = ", ".join(repr(w) for w in ops_text.STOPWORDS)

_RAKE_SQL = f"""
    WITH {_TOKS},
    flags AS (
      SELECT doc_id, pos, word, word IN ({_STOPS}) AS stop FROM toks
    ),
    runs AS (
      SELECT doc_id, pos, word, stop,
             sum(CASE WHEN stop THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS run
      FROM flags
    ),
    phrases AS (
      SELECT doc_id, run, count(*) AS plen,
             string_agg(word, ' ' ORDER BY pos) AS phrase
      FROM runs WHERE NOT stop GROUP BY 1, 2
    ),
    members AS (
      SELECT doc_id, run, plen, phrase,
             unnest(string_split(phrase, ' ')) AS word
      FROM phrases
    ),
    wscore AS (
      SELECT word, (sum(plen) * {ops_text.RAKE_Q}) // count(*) AS score_q
      FROM members GROUP BY 1
    ),
    pscore AS (
      SELECT m.doc_id, m.run, m.phrase, sum(w.score_q) AS phrase_q
      FROM members m JOIN wscore w ON w.word = m.word
      GROUP BY 1, 2, 3
    )
    SELECT phrase, max(phrase_q) AS phrase_q, count(*) AS n_occ
    FROM pscore GROUP BY phrase
    ORDER BY phrase_q DESC, phrase ASC LIMIT {_RAKE_K}
"""


@gate("rake_keywords", _RAKE_SQL)
def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.rake_keywords(docs, top_k=_RAKE_K)


# ---------------------------------------------------------------------------
# phrase_search — consecutive-position match counts; a repeated-term
# phrase so overlap semantics are pinned too.
# ---------------------------------------------------------------------------

_PHRASE = ["batch", "batch"]

_PH_JOINS = "\n".join(
    f"""    JOIN (SELECT doc_id, pos - {i} AS p0 FROM toks
          WHERE word = {term!r}) t{i} USING (doc_id, p0)"""
    for i, term in enumerate(_PHRASE[1:], start=1)
)

_PH_SQL = f"""
    WITH {_TOKS}
    SELECT doc_id, count(*) AS n_matches
    FROM (
      SELECT doc_id, pos AS p0 FROM toks WHERE word = {_PHRASE[0]!r}
    ) t0
{_PH_JOINS}
    GROUP BY doc_id
"""


@gate("phrase_search", _PH_SQL)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.phrase_search(docs, _PHRASE)


# ---------------------------------------------------------------------------
# zipf_fit — rank-frequency OLS slope over the top-n terms; integer
# moment sums, one exact IEEE division.
# ---------------------------------------------------------------------------

_ZIPF_N = 20
_ZQ = G.fnum(float(ops_text.ZIPF_Q))

_ZIPF_SQL = f"""
    WITH {_TOKS},
    top AS (
      SELECT word, count(*) AS freq FROM toks GROUP BY word
      ORDER BY freq DESC, word ASC LIMIT {_ZIPF_N}
    ),
    ranked AS (
      SELECT
        CAST(floor(ln(CAST(row_number() OVER (ORDER BY freq DESC,
          word ASC) AS DOUBLE)) * {_ZQ} + {G.fnum(0.5)}) AS BIGINT)
          AS x_q,
        CAST(floor(ln(CAST(freq AS DOUBLE)) * {_ZQ} + {G.fnum(0.5)})
          AS BIGINT) AS y_q
      FROM top
    ),
    mom AS (
      SELECT count(*) AS n_terms, sum(x_q) AS sx, sum(y_q) AS sy,
             sum(x_q * y_q) AS sxy, sum(x_q * x_q) AS sxx
      FROM ranked
    )
    SELECT n_terms,
           n_terms * sxy - sx * sy AS num,
           n_terms * sxx - sx * sx AS den,
           CAST(n_terms * sxy - sx * sy AS DOUBLE)
             / CAST(n_terms * sxx - sx * sx AS DOUBLE) AS slope
    FROM mom
"""


@gate("zipf_fit", _ZIPF_SQL)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.zipf_fit(docs, top_n=_ZIPF_N)

