"""Gate registry extension 149 — record-cleanup batch: SymSpell
deletion-indexed edit-1 join (brute-force oracle proves the bucket
join lossless) and sort-key fingerprint collision clustering."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import dedup as ops_dedup

# ---------------------------------------------------------------------------
# deletion_join — vocab of typo-shaped terms (type + small number);
# oracle = brute-force levenshtein over the whole vocab
# ---------------------------------------------------------------------------
_DJ_TERM = "concat(event_type, cast(event_id % 30 as string))"
_DJ_TERM_DK = "(event_type || CAST(event_id % 30 AS VARCHAR))"
_DJ_SQL = f"""
    WITH v AS MATERIALIZED (
      SELECT DISTINCT {_DJ_TERM_DK} AS w FROM events
    )
    SELECT a.w AS a, b.w AS b,
           CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
    FROM v a JOIN v b ON a.w < b.w
    WHERE levenshtein(a.w, b.w) <= 1
"""


@gate("deletion_join", _DJ_SQL)
def q_deletion_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.expr(_DJ_TERM).alias("w")
    )
    return ops_dedup.deletion_join(ev, word="w")


# ---------------------------------------------------------------------------
# sortkey_clusters — order-swapped synthetic titles collide on the
# token-sorted key
# ---------------------------------------------------------------------------
_SK_A = "event_type"
_SK_B = "concat('u', cast(user_id % 50 as string))"
_SK_B_DK = "('u' || CAST(user_id % 50 AS VARCHAR))"
_SK_TITLE = (
    f"(case when event_id % 2 = 0"
    f" then concat({_SK_A}, ' ', {_SK_B})"
    f" else concat({_SK_B}, ' ', {_SK_A}) end)"
)
_SK_TITLE_DK = (
    f"(CASE WHEN event_id % 2 = 0"
    f" THEN (event_type || ' ' || {_SK_B_DK})"
    f" ELSE ({_SK_B_DK} || ' ' || event_type) END)"
)
_SK_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS i, {_SK_TITLE_DK} AS t FROM events
    ),
    keyed AS (
      SELECT i,
             array_to_string(list_sort(list_distinct(
               string_split(lower(t), ' '))), ' ') AS key
      FROM s
    )
    SELECT key, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(i) AS BIGINT) AS min_id,
           CAST(max(i) AS BIGINT) AS max_id
    FROM keyed GROUP BY key HAVING count(*) >= 2
"""


@gate("sortkey_clusters", _SK_SQL)
def q_sortkey_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("i"),
        F.expr(_SK_TITLE).alias("t"),
    )
    return ops_dedup.sortkey_clusters(ev, text="t", id_col="i")
