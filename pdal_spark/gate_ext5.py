"""Gate registry extension 5 — corpus-level training-data quality
ops (Gopher repetition rules, tf-idf keyword extraction, CCNet-style
frequent-shingle boilerplate detection). Imported from gate_ext4
(end of chain).

All four gates follow the repo's exactness discipline: integer
counting throughout, one final IEEE division per ratio column, so
value hashes match the DuckDB oracle with no rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdal_spark.gate import _TOKS, _shingle_sql, _t, gate
from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import textops as ops_text

# (word, df) corpus document-frequency — shared by two oracles
_DFREQ = f"""
  (SELECT word, count(*) AS df
   FROM (SELECT DISTINCT doc_id, word FROM {_TOKS} dw) u GROUP BY word)
"""


# Gopher repetition rules: duplicate-word fraction + fraction of word
# characters covered by the most frequent bigram (Rae et al. 2021,
# table A1; the reference's derived-dimension pattern over text)
@gate(
    "repetition_stats",
    f"""
    WITH toks AS (SELECT * FROM {_TOKS} t0),
    big AS (
      SELECT doc_id, word,
             lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ),
    bcnt AS (
      SELECT doc_id, word, w2, count(*) AS cnt,
             count(*) * (length(word) + length(w2)) AS covered
      FROM big WHERE w2 IS NOT NULL GROUP BY 1, 2, 3
    ),
    top AS (
      SELECT doc_id, covered AS top_covered FROM (
        SELECT doc_id, covered, row_number() OVER (
                 PARTITION BY doc_id
                 ORDER BY covered DESC, cnt DESC, word ASC, w2 ASC
               ) AS r
        FROM bcnt
      ) rr WHERE r = 1
    ),
    pd AS (
      SELECT doc_id, count(*) AS n_tokens,
             count(DISTINCT word) AS n_distinct,
             sum(length(word)) AS word_chars
      FROM toks GROUP BY 1
    )
    SELECT pd.doc_id, n_tokens,
           cast(n_tokens - n_distinct as double)
             / cast(n_tokens as double) AS dup_word_frac,
           cast(coalesce(top_covered, 0) as double)
             / cast(word_chars as double) AS top_bigram_frac
    FROM pd LEFT JOIN top USING (doc_id)
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.repetition_stats(docs)


# tf-idf keyword extraction: top-3 terms per doc by
# (tf DESC, corpus df ASC, word ASC) — integer sort key, no float idf
@gate(
    "keyword_topk",
    f"""
    WITH tf AS (
      SELECT doc_id, word, count(*) AS tf FROM {_TOKS} t0 GROUP BY 1, 2
    )
    SELECT doc_id, rank, word, tf, df FROM (
      SELECT t.doc_id, t.word, t.tf, d.df,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf DESC, d.df ASC, t.word ASC
             ) AS rank
      FROM tf t JOIN {_DFREQ} d USING (word)
    ) r WHERE rank <= 3
    """,
)
def q_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.keyword_topk(docs, k=3)


# unigram-LM surprisal proxy: mean corpus document-frequency of the
# doc's tokens (no log -> exact; low = rare-vocab/gibberish page)
@gate(
    "commonness_score",
    f"""
    SELECT doc_id, count(*) AS n_tokens,
           cast(sum(df) as double) / cast(count(*) as double) AS mean_df
    FROM {_TOKS} t JOIN {_DFREQ} d USING (word)
    GROUP BY doc_id
    """,
)
def q_commonness_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.commonness_score(docs)


# CCNet-style boilerplate detection: fraction of a doc's distinct
# 3-gram shingles occurring in > 2 documents
@gate(
    "frequent_shingles",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle FROM {_shingle_sql()} s0
    ),
    sdf AS (SELECT shingle, count(*) AS sdf FROM sh GROUP BY 1)
    SELECT doc_id, count(*) AS n_shingles,
           cast(sum(CASE WHEN sdf > 2 THEN 1 ELSE 0 END) as double)
             / cast(count(*) as double) AS common_frac
    FROM sh JOIN sdf USING (shingle)
    GROUP BY doc_id
    """,
)
def q_frequent_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    v = ops_text.vocab(docs)
    return ops_dedup.frequent_shingle_fraction(
        docs, doc_threshold=2, vocab_df=v
    )


# ---------------------------------------------------------------------------
# filters.sample EXACT variant (SampleFilter.cpp serial view-order
# greedy): distributed dependency-depth fixpoint == serial scan,
# oracled by a DuckDB recursive CTE that IS the serial scan.
# ---------------------------------------------------------------------------
from pdal_spark import sqlgen as G  # noqa: E402
from pdal_spark.gate import _PTS, _points  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_POIS_R = 3.0
_POIS_N = 3000
_POIS_D2 = (
    "(q.px-p.lon)*(q.px-p.lon) + (q.py-p.lat)*(q.py-p.lat)"
    f" < {G.fnum(_POIS_R * _POIS_R)}"
)


@gate(
    "sample_poisson_exact",
    f"""
    WITH RECURSIVE o AS (
      SELECT event_id, lon, lat,
             row_number() OVER (ORDER BY event_id) AS rn
      FROM {_PTS} WHERE event_id < {_POIS_N}
    ),
    g AS (
      SELECT CAST(0 AS BIGINT) AS rn,
             CAST([] AS STRUCT(px DOUBLE, py DOUBLE)[]) AS kept,
             CAST([] AS BIGINT[]) AS kept_ids
      UNION ALL
      SELECT p.rn,
        CASE WHEN len(list_filter(g.kept, q -> {_POIS_D2})) = 0
          THEN list_append(g.kept, {{'px': p.lon, 'py': p.lat}})
          ELSE g.kept END,
        CASE WHEN len(list_filter(g.kept, q -> {_POIS_D2})) = 0
          THEN list_append(g.kept_ids, p.event_id)
          ELSE g.kept_ids END
      FROM g JOIN o p ON p.rn = g.rn + 1
    )
    SELECT unnest(kept_ids) AS event_id
    FROM g WHERE rn = (SELECT max(rn) FROM g)
    """,
)
def q_sample_poisson_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.sampling import sample_poisson_exact

    pts = _points(spark, sf_dir).where(F.col("event_id") < _POIS_N)
    out = sample_poisson_exact(
        pts, _POIS_R, x="lon", y="lat", id_col="event_id"
    )
    return out.select("event_id")


# ---------------------------------------------------------------------------
# filters.relaxationdartthrowing EXACT variant
# (RelaxationDartThrowing.cpp:62-160, shuffle=false): decaying-radius
# serial-greedy rounds with pinned keeps, truncated at count. The
# oracle is ONE recursive CTE cycling point-index 1..N per round and
# decaying the radius at each wrap (state carries the kept list).
# ---------------------------------------------------------------------------
_RDT_N = 400
_RDT_COUNT = 150
_RDT_R0 = 25.0
_RDT_DECAY = 0.5
_RDT_TERM = 3.0

_RDT_NRAD = (
    f"(CASE WHEN g.rn >= p.n THEN g.radius * {G.fnum(_RDT_DECAY)} "
    "ELSE g.radius END)"
)
_RDT_ADD = (
    "(NOT list_contains(g.kept_ids, p.event_id)) AND "
    "len(list_filter(g.kept, q -> "
    "(q.px-p.lon)*(q.px-p.lon) + (q.py-p.lat)*(q.py-p.lat) "
    f"< {_RDT_NRAD} * {_RDT_NRAD})) = 0"
)


@gate(
    "relaxation_dart_exact",
    f"""
    WITH RECURSIVE o AS MATERIALIZED (
      SELECT event_id, lon, lat,
             row_number() OVER (ORDER BY event_id) AS rn,
             count(*) OVER () AS n
      FROM {_PTS} WHERE event_id < {_RDT_N}
    ),
    g AS (
      SELECT CAST(0 AS BIGINT) AS step, CAST(0 AS BIGINT) AS rn,
             CAST({G.fnum(_RDT_R0)} AS DOUBLE) AS radius,
             CAST([] AS STRUCT(px DOUBLE, py DOUBLE)[]) AS kept,
             CAST([] AS BIGINT[]) AS kept_ids
      UNION ALL
      SELECT g.step + 1, p.rn, {_RDT_NRAD},
             CASE WHEN {_RDT_ADD}
               THEN list_append(g.kept, {{'px': p.lon, 'py': p.lat}})
               ELSE g.kept END,
             CASE WHEN {_RDT_ADD}
               THEN list_append(g.kept_ids, p.event_id)
               ELSE g.kept_ids END
      FROM g JOIN o p
        ON p.rn = CASE WHEN g.rn >= p.n THEN 1 ELSE g.rn + 1 END
      WHERE len(g.kept_ids) < {_RDT_COUNT}
        AND {_RDT_NRAD} * {_RDT_NRAD}
            >= {G.fnum(_RDT_TERM * _RDT_TERM)}
    )
    SELECT unnest(kept_ids) AS event_id, radius AS rdt_radius
    FROM g WHERE step = (SELECT max(step) FROM g)
    """,
)
def q_relaxation_dart_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.sampling import relaxation_dart_exact

    pts = _points(spark, sf_dir).where(F.col("event_id") < _RDT_N)
    out = relaxation_dart_exact(
        pts, _RDT_COUNT, _RDT_R0, _RDT_DECAY, _RDT_TERM,
        x="lon", y="lat", id_col="event_id",
    )
    return out.select("event_id", "rdt_radius")
