"""Gate registry extension 62 — warehouse/privacy batch: SCD type-2
validity intervals and prefix-preserving URL anonymization."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext52 import _PR_HOST, _PR_PATH, _PR_URL_SQL, _PR_URL_SPARK

# ---------------------------------------------------------------------------
# scd2_intervals — change stream keyed by user, ordered by event_id
# (strictly unique per key: deterministic lag/lead).
# ---------------------------------------------------------------------------


def _scd2_sql() -> str:
    return """
    WITH b AS MATERIALIZED (
      SELECT user_id AS k, event_id AS t, event_type AS v
      FROM events
    ),
    ch AS (
      SELECT k, t, v FROM (
        SELECT k, t, v,
               lag(v) OVER (PARTITION BY k ORDER BY t) AS pv
        FROM b
      ) x WHERE pv IS NULL OR v <> pv
    )
    SELECT k AS user_id, v AS event_type, t AS valid_from,
           lead(t) OVER (PARTITION BY k ORDER BY t) AS valid_to,
           CAST(CASE WHEN lead(t) OVER (PARTITION BY k ORDER BY t)
                IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
    FROM ch
    """


@gate("scd2_intervals", _scd2_sql())
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.temporal import scd2_intervals

    return scd2_intervals(
        _t(spark, sf_dir, "events"),
        key="user_id", ts_us="event_id", value="event_type",
    )


# ---------------------------------------------------------------------------
# anonymize_urls — over the synthetic mixed-shape URLs.
# ---------------------------------------------------------------------------


def _anon_sql() -> str:
    return f"""
    WITH pages AS MATERIALIZED (
      SELECT {_PR_URL_SQL} AS url FROM events
    ),
    b AS (
      SELECT url, {_PR_HOST} AS host,
             list_transform(
               list_filter(string_split({_PR_PATH}, '/'),
                           x -> x <> ''),
               s -> substr(md5(s), 1, 8)) AS toks
      FROM pages
    )
    SELECT url,
           'https://' || substr(md5(lower(host)), 1, 8) || '.anon'
             || CASE WHEN len(toks) > 0
                THEN '/' || array_to_string(toks, '/')
                ELSE '/' END AS anon_url
    FROM b
    """


@gate("anonymize_urls", _anon_sql())
def q_anon(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import anonymize_urls

    pages = _t(spark, sf_dir, "events").select(
        F.expr(_PR_URL_SPARK).alias("url")
    )
    return anonymize_urls(pages)
