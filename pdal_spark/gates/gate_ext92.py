"""Gate registry extension 92 — multi-criteria / series / survivor
batch: 2-d skyline (NOT-EXISTS dominance oracle vs the one-window
plan), exact-integer ACF terms, weighted (load) flow accumulation,
and field-level golden-record survivorship merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.gates.gate_ext82 import _FD_RES, _fd_best_cte, _fd_cells
from pdal_spark.gates.gate_ext84 import _DTW_KEYS, _DTW_N, _US_PER_H
from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import raster as ops_raster
from pdal_spark.operators import stats as ops_stats
from pdal_spark.operators import temporal as ops_temporal

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# skyline_2d — documents: minimize (n_chars, synthetic cost).
# ---------------------------------------------------------------------------

_SK_COST = f"({G.lehmer2('doc_id')} % 1000)"

_SK_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT doc_id, n_chars AS size_c,
             CAST({_SK_COST} AS BIGINT) AS cost_c
      FROM documents
    )
    SELECT doc_id, size_c, cost_c FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.size_c <= p.size_c AND q.cost_c <= p.cost_c
        AND (q.size_c < p.size_c OR q.cost_c < p.cost_c)
    )
"""


@gate("skyline_2d", _SK_SQL)
def q_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("size_c"),
        F.expr(G.lehmer2("doc_id") + " % 1000").cast("long")
        .alias("cost_c"),
    )
    return ops_stats.skyline_2d(docs, a="size_c", b="cost_c",
                                id_col="doc_id")


# ---------------------------------------------------------------------------
# acf — hourly count series per user bucket (the dtw fixture).
# ---------------------------------------------------------------------------

_ACF_LAGS = 4


def _acf_sql() -> str:
    lag_sel = "\n      UNION ALL".join(
        f"""
      SELECT k, {lag} AS lag,
             CAST(coalesce(sum(d * l{lag}), 0) AS BIGINT) AS num,
             CAST(sum(d * d) AS BIGINT) AS den
      FROM leads GROUP BY k"""
        for lag in range(1, _ACF_LAGS + 1)
    )
    lead_cols = ", ".join(
        f"lead(d, {lag}) OVER w AS l{lag}"
        for lag in range(1, _ACF_LAGS + 1)
    )
    return f"""
    WITH counts AS MATERIALIZED (
      SELECT user_id % {_DTW_KEYS} AS k,
             (epoch_us(ts) // {_US_PER_H}) % {_DTW_N} AS h,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    mom AS (SELECT k, count(*) AS n, sum(c) AS sx FROM counts
            GROUP BY k),
    dev AS MATERIALIZED (
      SELECT counts.k, h, CAST(n * c - sx AS BIGINT) AS d
      FROM counts JOIN mom ON mom.k = counts.k
    ),
    leads AS MATERIALIZED (
      SELECT k, d, {lead_cols}
      FROM dev WINDOW w AS (PARTITION BY k ORDER BY h)
    ),
    unions AS ({lag_sel})
    SELECT k, lag, num, den,
           CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS r
    FROM unions
"""


@gate("acf", _acf_sql())
def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % _DTW_KEYS).alias("k"),
        ((F.unix_micros(F.col("ts").cast("timestamp"))
          / F.lit(_US_PER_H)).cast("long") % _DTW_N).alias("h"),
    )
    counts = ev.groupBy("k", "h").agg(F.count(F.lit(1)).alias("c"))
    return ops_temporal.acf(counts, key="k", order="h", value="c",
                            max_lag=_ACF_LAGS)


# ---------------------------------------------------------------------------
# flow_accumulation_load — upstream POINT-COUNT load over the D8
# tree (load = the cell's own count).
# ---------------------------------------------------------------------------

_FL_SQL = f"""
    WITH RECURSIVE {_fd_best_cte()},
    walk AS (
      SELECT c AS src, nc AS cur FROM best
      UNION ALL
      SELECT w.src, b.nc FROM walk w JOIN best b ON b.c = w.cur
    )
    SELECT v.c AS cell, CAST(coalesce(a.ld, 0) AS BIGINT) AS acc
    FROM cellv v LEFT JOIN (
      SELECT w.cur, sum(s.zv) AS ld
      FROM walk w JOIN cellv s ON s.c = w.src
      GROUP BY w.cur
    ) a ON a.cur = v.c
"""


@gate("flow_accumulation_load", _FL_SQL)
def q_flow_accumulation_load(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    return ops_raster.flow_accumulation(
        _fd_cells(spark, sf_dir), res=_FD_RES, cell="cell",
        value="x", load="x",
    )


# ---------------------------------------------------------------------------
# golden_record — documents clustered doc_id % 40; lang nulled on
# doc_id % 3 = 0; ts = n_chars. The oracle encodes the (non-null,
# ts, id) pick as ONE bounded BIGINT (n_chars < 2^20, doc_id < 2^20
# at gate scales) since DuckDB arg_max needs a scalar key — order-
# preserving, so it matches Spark's struct max_by exactly.
# ---------------------------------------------------------------------------

_GR_K = 40


def _golden_sql() -> str:
    def pick(f: str) -> str:
        return (f"(CASE WHEN {f} IS NOT NULL THEN 1 ELSE 0 END)"
                f" * {1 << 40} + n_chars * {1 << 20} + doc_id")

    return f"""
    WITH rows_in AS MATERIALIZED (
      SELECT doc_id, doc_id % {_GR_K} AS cl, n_chars,
             CASE WHEN doc_id % 3 = 0 THEN NULL ELSE lang END
               AS lang,
             source
      FROM documents
    )
    SELECT cl, count(*) AS n_members,
           arg_max(doc_id, n_chars * {1 << 20} + doc_id)
             AS newest_id,
           arg_max(lang, {pick('lang')}) AS lang,
           arg_max(source, {pick('source')}) AS source
    FROM rows_in GROUP BY cl
"""


@gate("golden_record", _golden_sql())
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % _GR_K).alias("cl"), "n_chars",
        F.when(F.col("doc_id") % 3 != 0, F.col("lang")).alias("lang"),
        "source",
    )
    return ops_dedup.golden_record(
        docs, cluster="cl", ts="n_chars", fields=["lang", "source"],
    )

