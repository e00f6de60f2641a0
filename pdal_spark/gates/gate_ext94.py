"""Gate registry extension 94 — affinity + symbolic-series batch:
Apriori frequent itemsets to size 3 (ladder oracle with the same
prune), and SAX symbolic words over per-key series (cross-multiplied
integer breakpoints, string_agg-ordered word oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext84 import _DTW_KEYS, _DTW_N, _US_PER_H
from pdal_spark.operators import temporal as ops_temporal
from pdal_spark.operators import textops as ops_text

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# frequent_itemsets — baskets = user_id % 30, items = props-k % 20
# (universe-bounded so every SF terminates), min_support 12.
# ---------------------------------------------------------------------------

_FI_S = 12
_FI_BK = 30
_FI_IM = 20

_FI_SQL = f"""
    WITH bi AS MATERIALIZED (
      SELECT DISTINCT user_id % {_FI_BK} AS b,
             CAST(regexp_extract(props, '[0-9]+') AS BIGINT)
               % {_FI_IM} AS i
      FROM events
    ),
    l1 AS MATERIALIZED (
      SELECT i, count(*) AS support FROM bi GROUP BY i
      HAVING count(*) >= {_FI_S}
    ),
    bi1 AS MATERIALIZED (
      SELECT bi.b, bi.i FROM bi JOIN l1 USING (i)
    ),
    p AS MATERIALIZED (
      SELECT x.i, y.i AS j, count(*) AS support
      FROM bi1 x JOIN bi1 y ON x.b = y.b AND x.i < y.i
      GROUP BY 1, 2 HAVING count(*) >= {_FI_S}
    ),
    cand AS (
      SELECT ab.i, ab.j, ac.j AS k
      FROM p ab JOIN p ac ON ac.i = ab.i AND ab.j < ac.j
      WHERE EXISTS (SELECT 1 FROM p z
                    WHERE z.i = ab.j AND z.j = ac.j)
    ),
    t AS (
      SELECT c.i, c.j, c.k, count(*) AS support
      FROM cand c
      JOIN bi1 a ON a.i = c.i
      JOIN bi1 b2 ON b2.b = a.b AND b2.i = c.j
      JOIN bi1 c2 ON c2.b = a.b AND c2.i = c.k
      GROUP BY 1, 2, 3 HAVING count(*) >= {_FI_S}
    )
    SELECT 1 AS size, i AS item_a, CAST(NULL AS BIGINT) AS item_b,
           CAST(NULL AS BIGINT) AS item_c, support FROM l1
    UNION ALL
    SELECT 2, i, j, NULL, support FROM p
    UNION ALL
    SELECT 3, i, j, k, support FROM t
"""


@gate("frequent_itemsets", _FI_SQL)
def q_frequent_itemsets(spark: SparkSession,
                        sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % _FI_BK).alias("b"),
        (F.regexp_extract("props", "[0-9]+", 0).cast("long")
         % _FI_IM).alias("i"),
    )
    return ops_text.frequent_itemsets(
        ev, basket="b", item="i", min_support=_FI_S, max_size=3
    )


# ---------------------------------------------------------------------------
# sax_words — hourly count series per user bucket, 6 segments,
# breakpoints in n-scaled deviation units.
# ---------------------------------------------------------------------------

_SAX_SEG = 6
_SAX_BPS = (-240, 0, 240)


def _sax_sql() -> str:
    bps = sorted(_SAX_BPS)
    letter = " + ".join(
        f"(CASE WHEN n * seg_sum - seg_n * sx > {bp} * seg_n"
        " THEN 1 ELSE 0 END)"
        for bp in bps
    )
    return f"""
    WITH counts AS MATERIALIZED (
      SELECT user_id % {_DTW_KEYS} AS k,
             (epoch_us(ts) // {_US_PER_H}) % {_DTW_N} AS h,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT k, c, row_number() OVER (
               PARTITION BY k ORDER BY h
             ) - 1 AS r
      FROM counts
    ),
    mom AS (SELECT k, count(*) AS n, sum(c) AS sx FROM counts
            GROUP BY k),
    seg AS MATERIALIZED (
      SELECT ranked.k, (r * {_SAX_SEG}) // mom.n AS seg,
             any_value(mom.n) AS n, any_value(mom.sx) AS sx,
             count(*) AS seg_n, sum(c) AS seg_sum
      FROM ranked JOIN mom ON mom.k = ranked.k
      GROUP BY 1, 2
    ),
    lettered AS (
      SELECT k, seg, chr(97 + ({letter})) AS ch, seg_n FROM seg
    )
    SELECT k, string_agg(ch, '' ORDER BY seg) AS word,
           CAST(sum(seg_n) AS BIGINT) AS n_points
    FROM lettered GROUP BY k
"""


@gate("sax_words", _sax_sql())
def q_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % _DTW_KEYS).alias("k"),
        ((F.unix_micros(F.col("ts").cast("timestamp"))
          / F.lit(_US_PER_H)).cast("long") % _DTW_N).alias("h"),
    )
    counts = ev.groupBy("k", "h").agg(F.count(F.lit(1)).alias("c"))
    return ops_temporal.sax_words(
        counts, key="k", order="h", value="c",
        n_segments=_SAX_SEG, breakpoints_q=_SAX_BPS,
    )
