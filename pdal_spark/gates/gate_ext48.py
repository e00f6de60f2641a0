"""Gate registry extension 48 — crawl/retrieval pipeline batch:
politeness scheduling (max-plus prefix form), robots.txt
longest-match rules, anchor-text aggregation, PMI collocations,
ColBERT-style MaxSim late-interaction top-k, and calibration
(reliability-diagram) bins. All integer-exact oracles; the only ln
use follows the house lnq discipline (exact-integer double
arguments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate

# ---------------------------------------------------------------------------
# politeness_schedule — fetch_i = max(arrival_i, fetch_{i-1}+delay)
# per host, distributed via the max-plus closed form (one window).
# ---------------------------------------------------------------------------

_POL_DELAY = 300_000  # 0.3 s in µs


def _politeness_sql() -> str:
    d = _POL_DELAY
    return f"""
    WITH base AS (
      SELECT event_id, user_id % 97 AS host,
             epoch_us(ts) AS arrival_us
      FROM events
    ),
    r AS (
      SELECT event_id, host, arrival_us,
             CAST(row_number() OVER (
               PARTITION BY host ORDER BY arrival_us, event_id
             ) - 1 AS INT) AS seq
      FROM base
    ),
    f AS (
      SELECT event_id, host, arrival_us, seq,
             max(arrival_us - CAST(seq AS BIGINT) * {d}) OVER (
               PARTITION BY host ORDER BY arrival_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) + CAST(seq AS BIGINT) * {d} AS fetch_us
      FROM r
    )
    SELECT event_id, host, arrival_us, seq, fetch_us,
           fetch_us - arrival_us AS wait_us
    FROM f
    """


@gate("politeness_schedule", _politeness_sql())
def q_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.temporal import politeness_schedule

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.expr("user_id % 97").alias("host"),
        F.expr("unix_micros(cast(ts as timestamp))")
        .alias("arrival_us"),
    )
    return politeness_schedule(
        ev, "host", "arrival_us", _POL_DELAY, "event_id"
    )


# ---------------------------------------------------------------------------
# robots_rules — RFC 9309 longest-prefix match, allow on ties,
# allowed by default. Rules broadcast; corpus never shuffles.
# ---------------------------------------------------------------------------

_RULES_SQL = """
  SELECT 'h' || CAST(n_nationkey % 7 AS STRING) AS host,
         '/p' || CAST(n_nationkey % 5 AS STRING)
           || CASE WHEN n_nationkey % 3 = 0 THEN '/a' ELSE '' END
           AS path_prefix,
         n_nationkey % 2 = 0 AS allow
  FROM nation
"""
_URLS_SQL = """
  SELECT doc_id AS url_id,
         'h' || CAST(doc_id % 9 AS STRING) AS host,
         '/p' || CAST(doc_id % 5 AS STRING)
           || CASE WHEN doc_id % 2 = 0 THEN '/a' ELSE '/b' END
           || '/x' || CAST(doc_id AS STRING) AS path
  FROM documents
"""


def _robots_sql() -> str:
    return f"""
    WITH rules AS ({_RULES_SQL}),
    urls AS ({_URLS_SQL}),
    j AS (
      SELECT u.url_id, u.host, u.path, r.allow,
             r.path_prefix, length(r.path_prefix) AS plen
      FROM urls u LEFT JOIN rules r
        ON u.host = r.host
       AND u.path LIKE r.path_prefix || '%'
    ),
    rk AS (
      SELECT url_id, host, path, allow, path_prefix, plen,
             row_number() OVER (
               PARTITION BY url_id
               ORDER BY plen DESC NULLS LAST,
                        allow DESC NULLS LAST,
                        path_prefix ASC NULLS LAST
             ) AS rn
      FROM j
    )
    SELECT url_id, host, path,
           coalesce(allow, TRUE) AS allowed,
           coalesce(path_prefix, '') AS rule_prefix,
           CAST(coalesce(plen, 0) AS INT) AS rule_len
    FROM rk WHERE rn = 1
    """


@gate("robots_rules", _robots_sql())
def q_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import robots_rules

    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    _t(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents")
    rules = spark.sql(_RULES_SQL)
    urls = spark.sql(_URLS_SQL)
    return robots_rules(urls, rules)


# ---------------------------------------------------------------------------
# anchor_text_agg — top-k in-link anchor strings per target page.
# ---------------------------------------------------------------------------

_ANCH_K = 3


def _anchor_sql() -> str:
    return f"""
    WITH e AS (
      SELECT user_id AS src, event_id % 101 AS dst,
             event_type AS anchor
      FROM events
    ),
    per AS (
      SELECT dst, anchor, count(*) AS c_anchor
      FROM e GROUP BY 1, 2
    ),
    top AS (
      SELECT dst, anchor, c_anchor,
             CAST(row_number() OVER (
               PARTITION BY dst
               ORDER BY c_anchor DESC, anchor ASC
             ) AS INT) AS rank
      FROM per
    ),
    tot AS (
      SELECT dst, count(*) AS n_anchors,
             count(DISTINCT src) AS n_srcs
      FROM e GROUP BY 1
    )
    SELECT t.dst, t.rank, t.anchor, t.c_anchor,
           o.n_anchors, o.n_srcs
    FROM top t JOIN tot o USING (dst)
    WHERE t.rank <= {_ANCH_K}
    """


@gate("anchor_text_agg", _anchor_sql())
def q_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.graph import anchor_text_agg

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("src"),
        F.expr("event_id % 101").alias("dst"),
        F.col("event_type").alias("anchor"),
    )
    return anchor_text_agg(ev, top_k=_ANCH_K)


# ---------------------------------------------------------------------------
# pmi_collocations — integer-lnq PMI over adjacent bigrams.
# ---------------------------------------------------------------------------

_PMI_MIN = 3
_PMI_K = 40


def _pmi_sql() -> str:
    from pdal_spark.gate import _TOKS
    from pdal_spark.operators.textops import PMI_Q

    q = G.fnum(float(PMI_Q))
    return f"""
    WITH tk AS MATERIALIZED (
      SELECT doc_id, pos, word FROM {_TOKS} t
    ),
    uni AS (SELECT word, count(*) AS c_w FROM tk GROUP BY 1),
    nt AS (SELECT count(*) AS n_t FROM tk),
    bg0 AS (
      SELECT w1, w2 FROM (
        SELECT word AS w1,
               lead(word) OVER (PARTITION BY doc_id ORDER BY pos)
                 AS w2
        FROM tk) x WHERE w2 IS NOT NULL
    ),
    bg AS (SELECT w1, w2, count(*) AS c_ab FROM bg0 GROUP BY 1, 2),
    nb AS (SELECT count(*) AS n_b FROM bg0),
    scored AS (
      SELECT w1 AS a, w2 AS b, c_ab,
             CAST(floor(ln(CAST(c_ab * n_t * n_t AS DOUBLE))
                  * {q} + {G.fnum(0.5)}) AS BIGINT)
             - CAST(floor(ln(CAST(ca.c_w * cb.c_w * n_b AS DOUBLE))
                  * {q} + {G.fnum(0.5)}) AS BIGINT) AS pmi_q
      FROM bg
      JOIN uni ca ON ca.word = bg.w1
      JOIN uni cb ON cb.word = bg.w2
      CROSS JOIN nt CROSS JOIN nb
      WHERE c_ab >= {_PMI_MIN}
    )
    SELECT a, b, c_ab, pmi_q,
           CAST(row_number() OVER (ORDER BY pmi_q DESC, a, b)
                AS INT) AS rank
    FROM scored ORDER BY pmi_q DESC, a, b LIMIT {_PMI_K}
    """


@gate("pmi_collocations", _pmi_sql())
def q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import pmi_collocations

    docs = _t(spark, sf_dir, "documents")
    return pmi_collocations(
        docs, min_count=_PMI_MIN, top_k=_PMI_K
    )


# ---------------------------------------------------------------------------
# maxsim_topk — ColBERT late interaction, integer-quantized dots.
# ---------------------------------------------------------------------------

_MS_K = 5
_MS_QZ = (
    "list_transform(CAST(embedding AS DOUBLE[]),"
    " v -> CAST(floor(v * 1000000.0 + 0.5) AS BIGINT))"
)


def _maxsim_sql() -> str:
    return f"""
    WITH qt AS (
      SELECT vec_id % 2 AS query_id, vec_id AS qtok_id,
             {_MS_QZ} AS qv
      FROM embeddings WHERE vec_id < 6
    ),
    dt AS (
      SELECT vec_id % 40 AS doc_id, {_MS_QZ} AS dv
      FROM embeddings
    ),
    dots AS (
      SELECT query_id, qtok_id, doc_id,
             CAST(list_sum(list_transform(list_zip(qv, dv),
                  p -> p[1] * p[2])) AS BIGINT) AS dot
      FROM qt, dt
    ),
    m AS (
      SELECT query_id, qtok_id, doc_id, max(dot) AS mx
      FROM dots GROUP BY 1, 2, 3
    ),
    s AS (
      SELECT query_id, doc_id,
             CAST(sum(mx) AS BIGINT) AS score_q,
             count(*) AS n_qtoks
      FROM m GROUP BY 1, 2
    ),
    rk AS (
      SELECT query_id, doc_id, score_q, n_qtoks,
             CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY score_q DESC, doc_id ASC
             ) AS INT) AS sim_rank
      FROM s
    )
    SELECT * FROM rk WHERE sim_rank <= {_MS_K}
    """


@gate("maxsim_topk", _maxsim_sql())
def q_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.similarity import maxsim_topk

    emb = _t(spark, sf_dir, "embeddings")
    qt = emb.where("vec_id < 6").select(
        F.expr("vec_id % 2").alias("query_id"),
        F.col("vec_id").alias("qtok_id"),
        "embedding",
    )
    dt = emb.select(
        F.expr("vec_id % 40").alias("doc_id"), "embedding"
    )
    return maxsim_topk(qt, dt, k=_MS_K)


# ---------------------------------------------------------------------------
# calibration_bins — integer reliability-diagram sufficient stats.
# ---------------------------------------------------------------------------


def _calib_sql() -> str:
    return """
    WITH p AS (
      SELECT CAST((event_id * 2654435761) % 1000 AS DOUBLE)
               / 1000.0 AS score,
             CASE WHEN (event_id * 97) % 7 < 3 THEN 1 ELSE 0 END
               AS label
      FROM events
    ),
    qz AS (
      SELECT CAST(floor(score * 1000.0 + 0.5) AS BIGINT) AS sq,
             label
      FROM p
    )
    SELECT CAST(least((sq * 10) // 1000, 9) AS INT) AS bin,
           count(*) AS n,
           CAST(sum(label) AS BIGINT) AS sum_label,
           CAST(sum(sq) AS BIGINT) AS sum_score_q
    FROM qz GROUP BY 1
    """


@gate("calibration_bins", _calib_sql())
def q_calib(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.stats import calibration_bins

    ev = _t(spark, sf_dir, "events").select(
        F.expr(
            "CAST((event_id * 2654435761) % 1000 AS DOUBLE)"
            " / 1000.0e0"
        ).alias("score"),
        F.expr(
            "CASE WHEN (event_id * 97) % 7 < 3 THEN 1 ELSE 0 END"
        ).alias("label"),
    )
    return calibration_bins(ev, "score", "label", bins=10, q=1000)
