"""Gate registry extension 49 — curation-loop batch: CCNet
perplexity bucketing, systematic resampling, retrieval evaluation
(MRR/nDCG sufficient statistics), recrawl change-rate estimation,
and per-group embedding drift. Integer-exact oracles; ln use
follows the house lnq discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate

# ---------------------------------------------------------------------------
# perplexity_buckets — head/middle/tail by corpus-unigram fluency.
# ---------------------------------------------------------------------------


def _ppl_sql() -> str:
    from pdal_spark.gate import _TOKS
    from pdal_spark.operators.textops import LM_Q, PPL_SHIFT_STEPS

    q = G.fnum(float(LM_Q))
    off = PPL_SHIFT_STEPS * LM_Q
    return f"""
    WITH tk AS MATERIALIZED (
      SELECT doc_id, word FROM {_TOKS} t
    ),
    cnt AS (SELECT word, count(*) AS w_cnt FROM tk GROUP BY 1),
    tot AS (SELECT sum(w_cnt) AS n_total, count(*) AS n_vocab
            FROM cnt),
    terms AS (
      SELECT t.doc_id,
             cast(floor(ln(cast(c.w_cnt + 1 as double)
                  / cast(o.n_total + o.n_vocab as double))
                  * {q} + {G.fnum(0.5)}) as bigint) AS term_q
      FROM tk t JOIN cnt c USING (word) CROSS JOIN tot o
    ),
    per AS (
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(term_q) AS BIGINT) AS lm_q
      FROM terms GROUP BY 1
    ),
    keyed AS (
      SELECT doc_id, n_tokens, lm_q,
             ((lm_q + n_tokens * {off}) * 1000) // n_tokens
               AS mean_key
      FROM per
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               ORDER BY mean_key DESC, doc_id ASC) AS rn,
             count(*) OVER () AS nd
      FROM keyed
    )
    SELECT doc_id, n_tokens, lm_q, mean_key,
           CAST(((rn - 1) * 3) // nd AS INT) AS bucket
    FROM ranked
    """


@gate("perplexity_buckets", _ppl_sql())
def q_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import perplexity_buckets

    return perplexity_buckets(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# systematic_resample — low-variance with-replacement copies.
# ---------------------------------------------------------------------------

_SR_N = 2000


def _sysres_sql() -> str:
    n = _SR_N
    return f"""
    WITH w AS (
      SELECT event_id, (event_id * 13) % 50 + 1 AS weight
      FROM events
    ),
    c AS (
      SELECT event_id, weight,
             sum(weight) OVER (
               ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS hi,
             sum(weight) OVER () AS W
      FROM w
    ),
    g AS (
      SELECT event_id, weight, hi, hi - weight AS lo, W,
             W // {2 * n} AS u0
      FROM c
    )
    SELECT event_id, weight, copies FROM (
      SELECT event_id, weight,
             CAST(((hi + W - u0) * {n} + W - 1) // W
                  - ((lo + W - u0) * {n} + W - 1) // W
                  AS BIGINT) AS copies
      FROM g
    ) z WHERE copies > 0
    """


@gate("systematic_resample", _sysres_sql())
def q_sysres(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.sampling import systematic_resample

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.expr("(event_id * 13) % 50 + 1").alias("weight"),
    )
    return systematic_resample(ev, "event_id", "weight", _SR_N)


# ---------------------------------------------------------------------------
# retrieval_eval — MRR + nDCG@k integer sufficient statistics.
# ---------------------------------------------------------------------------

_RE_K = 10
def _runs_sql(idiv: str) -> str:
    # even custkeys -> ranked run lists (rank unique per query);
    # parity split works at every SF, unlike a key threshold
    return f"""
  SELECT (c_custkey {idiv} 2) % 20 AS query_id,
         (c_custkey * 7) % 97 AS doc_id,
         (c_custkey {idiv} 2) {idiv} 20 + 1 AS rank
  FROM customer WHERE c_custkey % 2 = 0 AND c_custkey < 4000
"""


def _qrels_sql(idiv: str) -> str:
    return f"""
  SELECT query_id, doc_id, rel FROM (
    SELECT (c_custkey {idiv} 2) % 20 AS query_id,
           (c_custkey * 3) % 97 AS doc_id,
           c_custkey % 4 AS rel,
           row_number() OVER (
             PARTITION BY (c_custkey {idiv} 2) % 20,
                          (c_custkey * 3) % 97
             ORDER BY c_custkey
           ) AS rn
    FROM customer WHERE c_custkey % 2 = 1
  ) q WHERE rn = 1
"""


def _reteval_sql() -> str:
    from pdal_spark.operators.similarity import EVAL_Q

    qs = G.fnum(float(EVAL_Q))
    ln2 = G.fnum(0.6931471805599453)

    def disc(r: str) -> str:
        return (f"cast(floor({qs} * {ln2}"
                f" / ln(cast(({r}) + 1 as double))"
                f" + {G.fnum(0.5)}) as bigint)")

    k = _RE_K
    return f"""
    WITH runs AS ({_runs_sql('//')}),
    qrels AS ({_qrels_sql('//')}),
    hits AS (
      SELECT r.query_id, r.rank, q.rel
      FROM runs r JOIN qrels q
        ON r.query_id = q.query_id AND r.doc_id = q.doc_id
    ),
    per AS (
      SELECT query_id,
             min(CASE WHEN rel > 0 THEN rank END) AS fr,
             CAST(sum(CASE WHEN rank <= {k} AND rel > 0 THEN
               ((CAST(1 AS BIGINT) << CAST(rel AS INT)) - 1)
               * ({disc('rank')})
             ELSE 0 END) AS BIGINT) AS dcg_q
      FROM hits GROUP BY 1
    ),
    ideal AS (
      SELECT query_id,
             CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_rel,
             CAST(sum(CASE WHEN ir <= {k} AND rel > 0 THEN
               ((CAST(1 AS BIGINT) << CAST(rel AS INT)) - 1)
               * ({disc('ir')})
             ELSE 0 END) AS BIGINT) AS idcg_q
      FROM (
        SELECT query_id, rel,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY rel DESC, doc_id ASC) AS ir
        FROM qrels) x
      GROUP BY 1
    )
    SELECT i.query_id, i.n_rel,
           coalesce({int(EVAL_Q)} // p.fr, 0) AS rr_q,
           CAST(coalesce(p.dcg_q, 0) AS BIGINT) AS dcg_q,
           i.idcg_q
    FROM ideal i LEFT JOIN per p USING (query_id)
    """


@gate("retrieval_eval", _reteval_sql())
def q_reteval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.similarity import retrieval_eval

    _t(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer")
    runs = spark.sql(_runs_sql('div'))
    qrels = spark.sql(_qrels_sql('div'))
    return retrieval_eval(runs, qrels, k=_RE_K)


# ---------------------------------------------------------------------------
# change_rate — Poisson recrawl-rate estimate per page.
# ---------------------------------------------------------------------------


def _chrate_sql() -> str:
    from pdal_spark.operators.temporal import CR_Q

    q = G.fnum(float(CR_Q))
    return f"""
    WITH v AS (
      SELECT event_id % 211 AS page,
             CASE WHEN (event_id * 31) % 5 < 2 THEN 1 ELSE 0 END
               AS changed
      FROM events
    )
    SELECT page, count(*) AS n_visits,
           CAST(sum(changed) AS BIGINT) AS n_changes,
           cast(floor(ln(cast(count(*) + 1 as double)) * {q}
                + {G.fnum(0.5)}) as bigint)
           - cast(floor(ln(cast(count(*) + 1 - sum(changed)
                as double)) * {q} + {G.fnum(0.5)}) as bigint)
             AS lambda_q
    FROM v GROUP BY 1
    """


@gate("change_rate", _chrate_sql())
def q_chrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.temporal import change_rate

    ev = _t(spark, sf_dir, "events").select(
        F.expr("event_id % 211").alias("page"),
        F.expr(
            "CASE WHEN (event_id * 31) % 5 < 2 THEN 1 ELSE 0 END"
        ).alias("changed"),
    )
    return change_rate(ev, "page", "changed")


# ---------------------------------------------------------------------------
# embedding_drift — per-group centroid shift between snapshots.
# ---------------------------------------------------------------------------


def _drift_sql() -> str:
    qz = ("cast(floor(cast(v as double) * 1000000.0e0 + 0.5e0)"
          " as bigint)")
    return f"""
    WITH ex AS (
      SELECT vec_id, label % 5 AS g,
             generate_subscripts(embedding, 1) - 1 AS dim,
             unnest(embedding) AS v
      FROM embeddings
    ),
    qa AS (
      SELECT g, dim, CAST(sum({qz}) AS BIGINT) AS s_a
      FROM ex WHERE vec_id % 2 = 0 GROUP BY 1, 2
    ),
    qb AS (
      SELECT g, dim, CAST(sum({qz}) AS BIGINT) AS s_b
      FROM ex WHERE vec_id % 2 = 1 GROUP BY 1, 2
    ),
    na AS (SELECT label % 5 AS g, count(*) AS n_a FROM embeddings
           WHERE vec_id % 2 = 0 GROUP BY 1),
    nb AS (SELECT label % 5 AS g, count(*) AS n_b FROM embeddings
           WHERE vec_id % 2 = 1 GROUP BY 1),
    d AS (
      SELECT qa.g, na.n_a, nb.n_b,
             cast(floor(cast(s_a as double) / n_a
                  - cast(s_b as double) / n_b
                  + 0.5e0) as bigint) AS dd
      FROM qa JOIN qb ON qa.g = qb.g AND qa.dim = qb.dim
      JOIN na ON na.g = qa.g JOIN nb ON nb.g = qa.g
    )
    SELECT g AS label_group, n_a, n_b,
           CAST(sum(dd * dd) AS BIGINT) AS drift2_q
    FROM d GROUP BY 1, 2, 3
    """


@gate("embedding_drift", _drift_sql())
def q_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.similarity import embedding_drift

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "label_group", F.expr("label % 5")
    )
    a = emb.where("vec_id % 2 = 0")
    b = emb.where("vec_id % 2 = 1")
    return embedding_drift(a, b, "label_group")
