"""Gate registry extension 52 — corpus-hygiene batch: C4-style
corpus-wide line dedup (boilerplate removal), Luhn payment-card
candidate validation (PII auditing), and hierarchical URL
path-prefix rollup (sitemap mining)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate

# ---------------------------------------------------------------------------
# line_dedup — C4 §2.2 boilerplate-line removal. Fixture: 4-line docs
# from orders where status/priority lines are massively duplicated,
# bucket lines duplicated ~n/400 times (straddling min_docs at small
# SF), key lines unique.
# ---------------------------------------------------------------------------

_LD_MIN_DOCS = 5

_LD_TEXT_SQL = (
    "'status: ' || o_orderstatus || chr(10) || "
    "'priority: ' || o_orderpriority || chr(10) || "
    "'bucket: ' || CAST(o_orderkey % 400 AS VARCHAR) || chr(10) || "
    "'key: ' || CAST(o_orderkey AS VARCHAR)"
)

_LD_TEXT_SPARK = (
    "concat('status: ', o_orderstatus, '\\n',"
    " 'priority: ', o_orderpriority, '\\n',"
    " 'bucket: ', cast(o_orderkey % 400 as string), '\\n',"
    " 'key: ', cast(o_orderkey as string))"
)


def _line_dedup_sql() -> str:
    return f"""
    WITH d AS MATERIALIZED (
      SELECT o_orderkey AS doc_id, {_LD_TEXT_SQL} AS text
      FROM orders
    ),
    l AS MATERIALIZED (
      SELECT doc_id,
             unnest(string_split(text, chr(10))) AS line,
             generate_subscripts(string_split(text, chr(10)), 1)
               AS pos
      FROM d
    ),
    c AS (
      SELECT line FROM l WHERE length(trim(line)) >= 4
      GROUP BY 1 HAVING count(DISTINCT doc_id) >= {_LD_MIN_DOCS}
    ),
    t AS (
      SELECT l.doc_id, l.pos, l.line, (c.line IS NULL) AS keep
      FROM l LEFT JOIN c ON c.line = l.line
    )
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN keep THEN line END,
                               chr(10) ORDER BY pos), '') AS text,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
             AS n_dropped
    FROM t GROUP BY 1
    """


@gate("line_dedup", _line_dedup_sql())
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import line_dedup

    docs = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("doc_id"),
        F.expr(_LD_TEXT_SPARK).alias("text"),
    )
    return line_dedup(docs, min_docs=_LD_MIN_DOCS, min_len=4)


# ---------------------------------------------------------------------------
# luhn_valid — ISO/IEC 7812 mod-10 over every maximal 13..19-digit
# run. Fixture: a 16-digit zero-padded key run + a 14-digit derived
# run per page; the short custkey run is length-filtered out.
# ---------------------------------------------------------------------------

_LU_TEXT_SQL = (
    "'card ' || lpad(CAST(o_orderkey AS VARCHAR), 16, '0')"
    " || ' ref ' || CAST(o_custkey AS VARCHAR) || ' t '"
    " || lpad(CAST((o_orderkey * 7919) % 100000000000000"
    " AS VARCHAR), 14, '0')"
)

_LU_TEXT_SPARK = (
    "concat('card ', lpad(cast(o_orderkey as string), 16, '0'),"
    " ' ref ', cast(o_custkey as string), ' t ',"
    " lpad(cast((o_orderkey * 7919) % 100000000000000 as string),"
    " 14, '0'))"
)


def _luhn_sql() -> str:
    return f"""
    WITH pages AS MATERIALIZED (
      SELECT o_orderkey AS doc_id, {_LU_TEXT_SQL} AS text
      FROM orders
    ),
    cands AS MATERIALIZED (
      SELECT doc_id, unnest(lf) AS cand,
             generate_subscripts(lf, 1) - 1 AS cand_idx
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(text, '[^0-9]+'),
                 x -> length(x) BETWEEN 13 AND 19) AS lf
        FROM pages
      )
    ),
    ex AS (
      SELECT doc_id, cand_idx, cand,
             unnest(range(length(cand))) AS t
      FROM cands
    ),
    dg AS (
      SELECT doc_id, cand_idx, cand, t,
             CAST(substr(reverse(cand), CAST(t + 1 AS INT), 1)
                  AS INT) AS d
      FROM ex
    ),
    lu AS (
      SELECT doc_id, cand_idx, cand,
             sum(CASE WHEN t % 2 = 0 THEN d
                 ELSE d * 2 - CASE WHEN d >= 5 THEN 9 ELSE 0 END
                 END) AS s
      FROM dg GROUP BY 1, 2, 3
    )
    SELECT doc_id, CAST(cand_idx AS INT) AS cand_idx, cand,
           CAST(length(cand) AS INT) AS n_digits,
           CAST(CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END AS INT)
             AS luhn_valid
    FROM lu
    """


@gate("luhn_valid", _luhn_sql())
def q_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import luhn_flags

    pages = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("doc_id"),
        F.expr(_LU_TEXT_SPARK).alias("text"),
    )
    return luhn_flags(pages)


# ---------------------------------------------------------------------------
# url_path_rollup — per-host path-subtree page counts over the same
# synthetic mixed-shape URLs url_features uses.
# ---------------------------------------------------------------------------

_PR_URL_SQL = (
    "'https://site-' || CAST(event_id % 50 AS VARCHAR)"
    " || '.example.com'"
    " || CASE WHEN event_id % 4 = 0 THEN '/'"
    "         WHEN event_id % 4 = 1 THEN"
    "           '/a/b/page-' || CAST(event_id AS VARCHAR)"
    "         WHEN event_id % 4 = 2 THEN"
    "           '/p?x=1&y=' || CAST(event_id AS VARCHAR)"
    "         ELSE '/deep/x/y/z#frag' END"
)

_PR_URL_SPARK = (
    "concat('https://site-', cast(event_id % 50 as string),"
    " '.example.com',"
    " CASE WHEN event_id % 4 = 0 THEN '/'"
    "      WHEN event_id % 4 = 1 THEN"
    "        concat('/a/b/page-', cast(event_id as string))"
    "      WHEN event_id % 4 = 2 THEN"
    "        concat('/p?x=1&y=', cast(event_id as string))"
    "      ELSE '/deep/x/y/z#frag' END)"
)

_PR_HOST = (
    "lower(regexp_extract(url,"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1))"
)
_PR_PATH = (
    "regexp_extract(url,"
    " '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1)"
)


def _path_rollup_sql() -> str:
    return f"""
    WITH pages AS MATERIALIZED (
      SELECT {_PR_URL_SQL} AS url FROM events
    ),
    b AS (
      SELECT url, {_PR_HOST} AS host,
             list_filter(string_split({_PR_PATH}, '/'),
                         x -> x <> '') AS segs
      FROM pages
    ),
    e AS (
      SELECT url, host, segs,
             unnest(range(0, least(len(segs), 8) + 1)) AS depth
      FROM b
    )
    SELECT host, CAST(depth AS INT) AS depth,
           '/' || coalesce(array_to_string(
                    list_slice(segs, 1, CAST(depth AS INT)), '/'),
                  '') AS prefix,
           count(*) AS n_pages,
           CAST(count(DISTINCT url) AS BIGINT) AS n_urls
    FROM e GROUP BY 1, 2, 3
    """


@gate("url_path_rollup", _path_rollup_sql())
def q_path_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdal_spark.operators.textops import url_path_rollup

    pages = _t(spark, sf_dir, "events").select(
        F.expr(_PR_URL_SPARK).alias("url")
    )
    return url_path_rollup(pages, max_depth=8)
