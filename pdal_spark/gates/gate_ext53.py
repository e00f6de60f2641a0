"""Gate registry extension 53 — training-pair mining batch: margin
bitext mining (LASER/CCMatrix), consistent contrastive negative
sampling, and smoothed unigram-KL corpus drift."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate

# ---------------------------------------------------------------------------
# bitext_margin — Artetxe & Schwenk margin over forward kNN pairs;
# src = even vec_ids, tgt = odd. Oracle is brute force both ways.
# ---------------------------------------------------------------------------

_BM_K = 4


def _bm_dir_sql(qt: str, ct: str, qid: str, cid: str) -> str:
    cos = (
        "list_dot_product(q.v, c.v)"
        " / (sqrt(list_dot_product(q.v, q.v))"
        " * sqrt(list_dot_product(c.v, c.v)))"
    )
    return f"""
      SELECT {qid}, {cid}, round(cos, 9) AS c9, sim_rank FROM (
        SELECT q.vec_id AS {qid}, c.vec_id AS {cid}, {cos} AS cos,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {cos} DESC, c.vec_id ASC
               ) AS sim_rank
        FROM {qt} q, {ct} c
      ) t WHERE sim_rank <= {_BM_K}
    """


def _bitext_sql() -> str:
    return f"""
    WITH src AS MATERIALIZED (
      SELECT vec_id, cast(embedding as double[]) AS v
      FROM embeddings WHERE vec_id % 2 = 0
    ),
    tgt AS MATERIALIZED (
      SELECT vec_id, cast(embedding as double[]) AS v
      FROM embeddings WHERE vec_id % 2 = 1
    ),
    f AS MATERIALIZED ({_bm_dir_sql('src', 'tgt', 'src_id', 'tgt_id')}),
    bk AS MATERIALIZED ({_bm_dir_sql('tgt', 'src', 'q_id', 'c_id')}),
    fa AS (
      SELECT src_id,
             round(cast(sum(cast(c9 as decimal(38,15))) as double)
                   / count(*), 9) AS knn_src
      FROM f GROUP BY 1
    ),
    ba AS (
      SELECT q_id AS tgt_id,
             round(cast(sum(cast(c9 as decimal(38,15))) as double)
                   / count(*), 9) AS knn_tgt
      FROM bk GROUP BY 1
    )
    SELECT f.src_id, f.tgt_id, f.c9 AS cosine,
           round(f.c9 / ((fa.knn_src + ba.knn_tgt) / 2e0), 6)
             AS margin,
           CAST(f.sim_rank AS INT) AS sim_rank
    FROM f
    JOIN fa USING (src_id)
    JOIN ba USING (tgt_id)
    """


@gate("bitext_margin", _bitext_sql())
def q_bitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.similarity import bitext_margin_topk

    emb = _t(spark, sf_dir, "embeddings")
    return bitext_margin_topk(
        emb.where("vec_id % 2 = 0"),
        emb.where("vec_id % 2 = 1"),
        k=_BM_K,
    )


# ---------------------------------------------------------------------------
# negative_sample — hash-ranked label-mismatch negatives (consistent
# sampling convention: pure function of the id pair).
# ---------------------------------------------------------------------------

_NS_K = 5


def _negsample_sql() -> str:
    return f"""
    WITH a AS (
      SELECT vec_id AS anchor_id, label AS al FROM embeddings
      WHERE vec_id % 7 = 0
    ),
    p AS (
      SELECT vec_id AS neg_id, label AS pl FROM embeddings
      WHERE vec_id % 3 = 0
    ),
    j AS (
      SELECT anchor_id, neg_id,
             ((anchor_id * 1000003 + neg_id + 12345) * 48271)
               % {G.M31} AS h
      FROM a, p WHERE al <> pl
    )
    SELECT anchor_id, neg_id, CAST(r AS INT) AS neg_rank FROM (
      SELECT anchor_id, neg_id, row_number() OVER (
               PARTITION BY anchor_id ORDER BY h ASC, neg_id ASC
             ) AS r
      FROM j
    ) t WHERE r <= {_NS_K}
    """


@gate("negative_sample", _negsample_sql())
def q_negsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.sampling import negative_sample

    emb = _t(spark, sf_dir, "embeddings")
    return negative_sample(
        emb.where("vec_id % 7 = 0"),
        emb.where("vec_id % 3 = 0"),
        k=_NS_K,
    )


# ---------------------------------------------------------------------------
# unigram_kl — add-one-smoothed KL(A||B) between the even and odd
# halves of the documents corpus, per-word integer contributions.
# ---------------------------------------------------------------------------


def _unigram_kl_sql() -> str:
    from pdal_spark.operators.textops import KL_Q

    qs = G.fnum(float(KL_Q))
    return f"""
    WITH ca AS MATERIALIZED (
      SELECT w, count(*) AS c_a FROM (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id % 2 = 0
      ) GROUP BY 1
    ),
    cb AS MATERIALIZED (
      SELECT w, count(*) AS c_b FROM (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id % 2 = 1
      ) GROUP BY 1
    ),
    jj AS MATERIALIZED (
      SELECT coalesce(ca.w, cb.w) AS word,
             coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
      FROM ca FULL OUTER JOIN cb ON ca.w = cb.w
    ),
    tot AS (SELECT sum(c_a) AS na, sum(c_b) AS nb,
                   count(*) AS v FROM jj)
    SELECT word, CAST(c_a AS BIGINT) AS c_a,
           CAST(c_b AS BIGINT) AS c_b,
           CAST((c_a + 1) * (
             CAST(floor(ln(CAST((c_a + 1) * (nb + v) AS DOUBLE))
                  * {qs} + 0.5e0) AS BIGINT)
             - CAST(floor(ln(CAST((c_b + 1) * (na + v) AS DOUBLE))
                  * {qs} + 0.5e0) AS BIGINT)
           ) AS BIGINT) AS contrib_q
    FROM jj CROSS JOIN tot
    """


@gate("unigram_kl", _unigram_kl_sql())
def q_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import unigram_kl

    docs = _t(spark, sf_dir, "documents")
    return unigram_kl(
        docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1")
    )
