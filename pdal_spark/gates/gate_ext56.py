"""Gate registry extension 56 — label propagation + robust prep:
kNN mean-label prediction over embeddings and per-group exact-rank
winsorization."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate

# ---------------------------------------------------------------------------
# knn_predict — mean label of the 5 cosine neighbors (self excluded,
# the cosine_topk convention). Oracle is brute force.
# ---------------------------------------------------------------------------

_KP_K = 5

_KP_COS = (
    "list_dot_product(q.v, c.v)"
    " / (sqrt(list_dot_product(q.v, q.v))"
    " * sqrt(list_dot_product(c.v, c.v)))"
)


def _knn_predict_sql() -> str:
    return f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id, cast(embedding as double[]) AS v
      FROM embeddings WHERE vec_id < 30
    ),
    c AS MATERIALIZED (
      SELECT vec_id, cast(embedding as double[]) AS v, label
      FROM embeddings
    ),
    nn AS (
      SELECT query_id, lab FROM (
        SELECT q.vec_id AS query_id, c.label AS lab,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_KP_COS} DESC, c.vec_id ASC
               ) AS r
        FROM q, c WHERE q.vec_id <> c.vec_id
      ) t WHERE r <= {_KP_K}
    )
    SELECT query_id, count(*) AS n_nb,
           CAST(sum(lab) AS BIGINT) AS sum_label,
           CAST(sum(lab) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS pred
    FROM nn GROUP BY 1
    """


@gate("knn_predict", _knn_predict_sql())
def q_knn_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.similarity import knn_predict

    emb = _t(spark, sf_dir, "embeddings")
    return knn_predict(emb.where("vec_id < 30"), emb, k=_KP_K)


# ---------------------------------------------------------------------------
# winsorize — clip events.value to per-event_type exact rank
# quantiles (values pass through untouched: float-exact).
# ---------------------------------------------------------------------------


def _winsorize_sql() -> str:
    return """
    WITH b AS MATERIALIZED (
      SELECT event_type AS g, event_id AS i, value AS v FROM events
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY g ORDER BY v ASC)
               AS r,
             count(*) OVER (PARTITION BY g) AS n
      FROM b
    ),
    bounds AS (
      SELECT g,
             min(CASE WHEN r = greatest(1, ceil(0.05 * n))
                 THEN v END) AS lo,
             min(CASE WHEN r = greatest(1, ceil(0.95 * n))
                 THEN v END) AS hi
      FROM r GROUP BY g
    )
    SELECT b.g AS event_type, b.i AS event_id, b.v AS value,
           lo, hi, least(greatest(b.v, lo), hi) AS clipped
    FROM b JOIN bounds USING (g)
    """


@gate("winsorize", _winsorize_sql())
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.stats import winsorize

    ev = _t(spark, sf_dir, "events")
    return winsorize(
        ev, value="value", group_col="event_type",
        id_col="event_id",
    )
