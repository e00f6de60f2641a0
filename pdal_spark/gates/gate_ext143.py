"""Gate registry extension 143 — long-memory/dispersion batch:
Hurst R/S ladder, Juilland's D, Gries' DP."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal
from pdal_spark.operators import textops as ops_text

# ---------------------------------------------------------------------------
# hurst_rs — R/S over the event_id-ordered value series
# ---------------------------------------------------------------------------
_HR_SIZES = [125, 625]
_HR_Q = float(ops_temporal.HURST_Q)
_HR_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT v,
             CAST(row_number() OVER (ORDER BY o ASC) AS BIGINT) - 1
               AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM s
    ),
    ladder AS MATERIALIZED (
      SELECT v, CAST(t.m AS BIGINT) AS m, rn // t.m AS b,
             rn % t.m + 1 AS j, rn
      FROM base,
           (SELECT unnest([{", ".join(map(str, _HR_SIZES))}]) AS m)
             t
      WHERE rn < (n // t.m) * t.m
    ),
    dev AS (
      SELECT m, b,
             m * sum(v) OVER (PARTITION BY m, b ORDER BY rn ASC
               ROWS UNBOUNDED PRECEDING)
             - j * sum(v) OVER (PARTITION BY m, b) AS cum,
             m * sum(v * v) OVER (PARTITION BY m, b)
             - sum(v) OVER (PARTITION BY m, b)
             * sum(v) OVER (PARTITION BY m, b) AS den
      FROM ladder
    ),
    blocks AS (
      SELECT m, b,
             CAST(max(cum) - min(cum) AS BIGINT) AS r_int,
             CAST(max(den) AS BIGINT) AS den
      FROM dev GROUP BY m, b
    ),
    agg AS (
      SELECT m, CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(cast(floor(cast(r_int as double)
               / sqrt(cast(den as double))
               * {_HR_Q!r}e0 + 0.5e0) as bigint)) AS BIGINT)
               AS sum_rs_q
      FROM blocks WHERE den > 0 GROUP BY m
    )
    SELECT m, n_blocks, sum_rs_q,
           cast(sum_rs_q as double)
           / (cast(n_blocks as double) * {_HR_Q!r}e0) AS mean_rs
    FROM agg
"""


@gate("hurst_rs", _HR_SQL)
def q_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.hurst_rs(
        ev, order="o", value="v", sizes=_HR_SIZES
    )


# ---------------------------------------------------------------------------
# juilland_d / gries_dp — dispersion over doc_id-mod parts
# ---------------------------------------------------------------------------
_DSP_K = 8
_DSP_MIN = 20
_DSP_TOK = f"""
    tok AS MATERIALIZED (
      SELECT unnest(string_split(text, ' ')) AS word,
             doc_id % {_DSP_K} AS part
      FROM documents
    )
"""

_JD_SQL = f"""
    WITH {_DSP_TOK},
    fip AS (
      SELECT word, part, CAST(count(*) AS BIGINT) AS f
      FROM tok GROUP BY word, part
    ),
    mom AS (
      SELECT word, CAST(sum(f) AS BIGINT) AS t,
             CAST(sum(f * f) AS BIGINT) AS sf2
      FROM fip GROUP BY word HAVING sum(f) >= {_DSP_MIN}
    )
    SELECT word, t, sf2,
           CASE WHEN t > 0 THEN 1.0e0
             - sqrt(cast({_DSP_K} * sf2 - t * t as double))
             / (cast(t as double) * sqrt({float(_DSP_K)!r}e0
             - 1.0e0)) END AS d
    FROM mom
"""


@gate("juilland_d", _JD_SQL)
def q_juilland_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.juilland_d(
        docs, n_parts=_DSP_K, min_freq=_DSP_MIN
    )


_DP_SQL = f"""
    WITH {_DSP_TOK},
    sizes AS (
      SELECT part, CAST(count(*) AS BIGINT) AS size_i
      FROM tok GROUP BY part
    ),
    tot AS (SELECT CAST(sum(size_i) AS BIGINT) AS s_all FROM sizes),
    vip AS (
      SELECT word, part, CAST(count(*) AS BIGINT) AS v
      FROM tok GROUP BY word, part
    ),
    fw AS (
      SELECT word, CAST(sum(v) AS BIGINT) AS f
      FROM vip GROUP BY word HAVING sum(v) >= {_DSP_MIN}
    ),
    obs AS (
      SELECT vip.word, CAST(max(fw.f) AS BIGINT) AS f,
             CAST(max(tot.s_all) AS BIGINT) AS s_all,
             CAST(sum(abs(vip.v * tot.s_all - fw.f * sizes.size_i))
               AS BIGINT) AS a_obs,
             CAST(sum(sizes.size_i) AS BIGINT) AS obs_size
      FROM vip
      JOIN fw ON vip.word = fw.word
      JOIN sizes ON vip.part = sizes.part, tot
      GROUP BY vip.word
    )
    SELECT word, f,
           CAST(a_obs + f * (s_all - obs_size) AS BIGINT) AS dp_num,
           cast(a_obs + f * (s_all - obs_size) as double)
           / (2.0e0 * cast(f as double) * cast(s_all as double))
             AS dp
    FROM obs
"""


@gate("gries_dp", _DP_SQL)
def q_gries_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.gries_dp(
        docs, n_parts=_DSP_K, min_freq=_DSP_MIN
    )
