"""Gate registry extension 35 — experiment-readout & crawl-prior
batch: two-proportion A/B z-test (exact integer counts, fixed IEEE
z), row-local URL structure features, and the rich-club coefficient
(hub-interconnection diagnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext12 import _EDGES_SQL, _edges
from pdal_spark.operators import graph as ops_graph
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import textops as ops_text

# ---------------------------------------------------------------------------
# ab_test — click vs view conversion on value > 250.
# ---------------------------------------------------------------------------

_AB_PRED = "value > 250.0e0"
_AB_A, _AB_B = "click", "view"

_AB_PA = "(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
_AB_PB = "(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
_AB_PP = "(CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
_AB_Z = (
    f"({_AB_PA} - {_AB_PB}) / sqrt({_AB_PP} * (1.0e0 - {_AB_PP})"
    " * (1.0e0 / CAST(n_a AS DOUBLE) + 1.0e0 / CAST(n_b AS DOUBLE)))"
)

_AB_SQL = f"""
    WITH agg AS (
      SELECT
        sum(CASE WHEN event_type = '{_AB_A}' THEN 1 ELSE 0 END) AS n_a,
        sum(CASE WHEN event_type = '{_AB_A}' AND ({_AB_PRED})
            THEN 1 ELSE 0 END) AS x_a,
        sum(CASE WHEN event_type = '{_AB_B}' THEN 1 ELSE 0 END) AS n_b,
        sum(CASE WHEN event_type = '{_AB_B}' AND ({_AB_PRED})
            THEN 1 ELSE 0 END) AS x_b
      FROM events
    )
    SELECT n_a, x_a, n_b, x_b,
           CASE WHEN n_a > 0 AND n_b > 0 AND x_a + x_b > 0
                AND x_a + x_b < n_a + n_b THEN {_AB_Z} END AS z
    FROM agg
"""


@gate("ab_test", _AB_SQL)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ops_stats.ab_test(ev, "event_type", _AB_PRED, _AB_A, _AB_B)


# ---------------------------------------------------------------------------
# url_features — structure vector over synthetic page URLs (mixed
# shapes: homepage, deep path, query params, fragments).
# ---------------------------------------------------------------------------

_UF_URL = (
    "'https://site-' || CAST(event_id % 50 AS VARCHAR)"
    " || '.example.com'"
    " || CASE WHEN event_id % 4 = 0 THEN '/'"
    "         WHEN event_id % 4 = 1 THEN"
    "           '/a/b/page-' || CAST(event_id AS VARCHAR)"
    "         WHEN event_id % 4 = 2 THEN"
    "           '/p?x=1&y=' || CAST(event_id AS VARCHAR)"
    "         ELSE '/deep/x/y/z#frag' END"
)

_UF_HOST = (
    "lower(regexp_extract(url,"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1))"
)
_UF_PATH = (
    "regexp_extract(url,"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1)"
)
_UF_QUERY = "regexp_extract(url, '\\?([^#]*)', 1)"

_UF_SQL = f"""
    WITH pages AS MATERIALIZED (
      SELECT event_id AS doc_id, {_UF_URL} AS url FROM events
    )
    SELECT doc_id, {_UF_HOST} AS host,
           CAST(length({_UF_PATH}) AS INT) AS path_len,
           CAST(length(regexp_replace({_UF_PATH}, '[^/]', '', 'g'))
             - CASE WHEN {_UF_PATH} LIKE '%/' THEN 1 ELSE 0 END
             AS INT) AS path_depth,
           CASE WHEN length({_UF_QUERY}) = 0 THEN 0 ELSE
             CAST(length(regexp_replace({_UF_QUERY}, '[^&]', '', 'g'))
               + 1 AS INT) END AS n_query_params,
           ({_UF_PATH} = '' OR {_UF_PATH} = '/') AS is_homepage,
           (url LIKE 'https://%') AS is_https,
           (url LIKE '%#%') AS has_fragment
    FROM pages
"""


@gate("url_features", _UF_SQL)
def q_url_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pages = ev.select(
        F.col("event_id").alias("doc_id"),
        F.expr(
            "concat('https://site-', cast(event_id % 50 as string),"
            " '.example.com',"
            " CASE WHEN event_id % 4 = 0 THEN '/'"
            " WHEN event_id % 4 = 1 THEN"
            "   concat('/a/b/page-', cast(event_id as string))"
            " WHEN event_id % 4 = 2 THEN"
            "   concat('/p?x=1&y=', cast(event_id as string))"
            " ELSE '/deep/x/y/z#frag' END)"
        ).alias("url"),
    )
    return ops_text.url_features(pages)


# ---------------------------------------------------------------------------
# rich_club — hub interconnection at degree > 3.
# ---------------------------------------------------------------------------

_RC_K = 3

_RC_SQL = f"""
    WITH {_EDGES_SQL},
    club AS (SELECT node FROM deg WHERE degree > {_RC_K}),
    ec AS (
      SELECT e.lo, e.hi FROM e
      JOIN club a ON a.node = e.lo
      JOIN club b ON b.node = e.hi
    ),
    n AS (SELECT count(*) AS n_club FROM club),
    m AS (SELECT count(*) AS e_club FROM ec)
    SELECT n_club, e_club,
           CASE WHEN n_club >= 2 THEN (2 * e_club * {ops_graph.RC_Q})
             // (n_club * (n_club - 1)) ELSE CAST(0 AS BIGINT) END
             AS phi_q
    FROM n, m
"""


@gate("rich_club", _RC_SQL)
def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops_graph.rich_club(_edges(spark, sf_dir), k=_RC_K)

