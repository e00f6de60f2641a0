"""Gate registry extension 84 — series/shape similarity + text
segmentation batch: exact integer DTW between hourly crawl-rate
profiles (anti-diagonal recursive-CTE oracle — each wavefront is
elementwise-independent, so the whole diagonal rides one LIST row),
blocked pairwise Hausdorff over user trajectories, TextTiling gap
depths, and literal multi-pattern occurrence counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _PTS, _points, _t, gate
from pdal_spark.gates.gate_ext18 import _TOKS
from pdal_spark.operators import knn as ops_knn
from pdal_spark.operators import temporal as ops_temporal
from pdal_spark.operators import textops as ops_text

DK = G.DUCKDB

# ---------------------------------------------------------------------------
# dtw_pairs — 24-hour event-count profiles per user bucket.
# ---------------------------------------------------------------------------

_DTW_KEYS = 6
_DTW_N = 24  # series length (hour of day)
_US_PER_H = 3_600_000_000


def _dtw_sql() -> str:
    n1 = _DTW_N - 1  # 23
    smax = 2 * _DTW_N - 2  # 46
    inf = 1 << 60
    # new diagonal s+1: x is the 0-based offset, i = lo1 + x,
    # j = (s+1) - i; positions into cur (diag s) / prv (diag s-1)
    # derived from the lo shifts.
    lo1 = f"greatest(0, s + 1 - {n1})"
    lo0 = f"greatest(0, s - {n1})"
    lom1 = f"greatest(0, s - 1 - {n1})"
    i = f"({lo1} + x)"
    j = f"(s + 1 - {i})"
    up = (
        f"CASE WHEN {i} >= 1 THEN"
        f" coalesce(cur[{i} - 1 - ({lo0}) + 1], {inf})"
        f" ELSE {inf} END"
    )
    left = (
        f"CASE WHEN {j} >= 1 THEN"
        f" coalesce(cur[{i} - ({lo0}) + 1], {inf})"
        f" ELSE {inf} END"
    )
    diag = (
        f"CASE WHEN {i} >= 1 AND {j} >= 1 THEN"
        f" coalesce(prv[{i} - 1 - ({lom1}) + 1], {inf})"
        f" ELSE {inf} END"
    )
    dlen = f"least({n1}, s + 1) - ({lo1}) + 1"
    return f"""
    WITH RECURSIVE counts AS MATERIALIZED (
      SELECT user_id % {_DTW_KEYS} AS k,
             (epoch_us(ts) // {_US_PER_H}) % {_DTW_N} AS h,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    keys AS MATERIALIZED (SELECT DISTINCT k FROM counts),
    hours AS (SELECT unnest(range({_DTW_N})) AS h),
    dense AS MATERIALIZED (
      SELECT keys.k, hours.h, CAST(coalesce(c.c, 0) AS BIGINT) AS c
      FROM keys CROSS JOIN hours
      LEFT JOIN counts c ON c.k = keys.k AND c.h = hours.h
    ),
    ser AS MATERIALIZED (
      SELECT k, list(c ORDER BY h) AS vals FROM dense GROUP BY k
    ),
    pairs AS MATERIALIZED (
      SELECT a.k AS ka, b.k AS kb, a.vals AS va, b.vals AS vb
      FROM ser a JOIN ser b ON a.k < b.k
    ),
    dp AS (
      SELECT ka, kb, va, vb, 0 AS s,
             [abs(va[1] - vb[1])] AS cur,
             CAST(NULL AS BIGINT[]) AS prv
      FROM pairs
      UNION ALL
      SELECT ka, kb, va, vb, s + 1,
             list_transform(range(0, {dlen}), x ->
               abs(va[{i} + 1] - vb[{j} + 1])
               + least({up}, {left}, {diag})),
             cur
      FROM dp WHERE s < {smax}
    )
    SELECT ka AS key_a, kb AS key_b, CAST(cur[1] AS BIGINT) AS dtw
    FROM dp WHERE s = {smax}
    """


@gate("dtw_pairs", _dtw_sql())
def q_dtw_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % _DTW_KEYS).alias("k"),
        ((F.unix_micros(F.col("ts").cast("timestamp"))
          / F.lit(_US_PER_H)).cast("long") % _DTW_N).alias("h"),
    )
    counts = ev.groupBy("k", "h").agg(F.count(F.lit(1)).alias("c"))
    keys = counts.select("k").distinct()
    hours = ev.sparkSession.range(_DTW_N).select(
        F.col("id").alias("h"))
    dense = (
        keys.crossJoin(hours)
        .join(counts, on=["k", "h"], how="left")
        .select("k", "h", F.coalesce("c", F.lit(0)).alias("c"))
    )
    return ops_temporal.dtw_distance(dense, key="k", order="h",
                                     value="c")


# ---------------------------------------------------------------------------
# hausdorff_pairs — user trajectories, blocked by user_id % 12.
# ---------------------------------------------------------------------------

_HP_BLOCKS = 12
_HP_Q = 1 << 20

_HP_SQL = f"""
    WITH pts AS MATERIALIZED (
      SELECT user_id AS k, user_id % {_HP_BLOCKS} AS b,
             CAST(floor(({G.geo_lon('event_id')}) * {_HP_Q})
                  AS BIGINT) AS xq,
             CAST(floor(({G.geo_lat('event_id')}) * {_HP_Q})
                  AS BIGINT) AS yq
      FROM events
    ),
    j AS MATERIALIZED (
      SELECT a.k AS ka, b.k AS kb, a.xq AS ax, a.yq AS ay,
             b.xq AS bx, b.yq AS by,
             (a.xq - b.xq) * (a.xq - b.xq)
             + (a.yq - b.yq) * (a.yq - b.yq) AS d2
      FROM pts a JOIN pts b ON a.b = b.b AND a.k < b.k
    ),
    hab AS (
      SELECT ka, kb, max(dm) AS h_ab2 FROM (
        SELECT ka, kb, ax, ay, min(d2) AS dm FROM j
        GROUP BY ka, kb, ax, ay
      ) GROUP BY ka, kb
    ),
    hba AS (
      SELECT ka, kb, max(dm) AS h_ba2 FROM (
        SELECT ka, kb, bx, by, min(d2) AS dm FROM j
        GROUP BY ka, kb, bx, by
      ) GROUP BY ka, kb
    )
    SELECT hab.ka AS key_a, hab.kb AS key_b, h_ab2, h_ba2,
           greatest(h_ab2, h_ba2) AS h2
    FROM hab JOIN hba ON hab.ka = hba.ka AND hab.kb = hba.kb
"""


@gate("hausdorff_pairs", _HP_SQL)
def q_hausdorff_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).select(
        "user_id", (F.col("user_id") % _HP_BLOCKS).alias("blk"),
        "lat", "lon",
    )
    return ops_knn.hausdorff_pairs(
        pts, key="user_id", block="blk", x="lon", y="lat",
        coord_q=_HP_Q,
    )


# ---------------------------------------------------------------------------
# text_tiling — gap cohesion/depth over documents, 10-token blocks.
# ---------------------------------------------------------------------------

_TT_B = 10
_TT_K = 2

_TT_SQL = f"""
    WITH {_TOKS},
    bl AS MATERIALIZED (
      SELECT DISTINCT doc_id, pos // {_TT_B} AS blk, word FROM toks
    ),
    sim AS MATERIALIZED (
      SELECT a.doc_id, a.blk AS gap, count(*) AS sim
      FROM bl a JOIN bl b
        ON b.doc_id = a.doc_id AND b.blk = a.blk + 1
       AND b.word = a.word
      GROUP BY a.doc_id, a.blk
    ),
    ng AS MATERIALIZED (
      SELECT doc_id, unnest(range(max(blk))) AS gap
      FROM bl GROUP BY doc_id HAVING max(blk) >= 1
    ),
    dense AS MATERIALIZED (
      SELECT ng.doc_id, ng.gap,
             CAST(coalesce(sim.sim, 0) AS BIGINT) AS sim
      FROM ng LEFT JOIN sim
        ON sim.doc_id = ng.doc_id AND sim.gap = ng.gap
    )
    SELECT doc_id, gap, sim,
           greatest(0, coalesce(max(sim) OVER (
             PARTITION BY doc_id ORDER BY gap
             ROWS BETWEEN {_TT_K} PRECEDING AND 1 PRECEDING
           ), sim) - sim)
           + greatest(0, coalesce(max(sim) OVER (
             PARTITION BY doc_id ORDER BY gap
             ROWS BETWEEN 1 FOLLOWING AND {_TT_K} FOLLOWING
           ), sim) - sim) AS depth
    FROM dense
"""


@gate("text_tiling", _TT_SQL)
def q_text_tiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.text_tiling(
        docs, block_tokens=_TT_B, peak_window=_TT_K
    )


# ---------------------------------------------------------------------------
# multi_pattern_counts — literal blocklist hit counts.
# ---------------------------------------------------------------------------

_MP_PATTERNS = ["table", "scan slow", "agg", "value fast"]

_MP_SQL = f"""
    WITH pats AS (
      SELECT unnest([{", ".join(repr(p) for p in _MP_PATTERNS)}])
        AS pattern
    )
    SELECT doc_id, pattern,
           CAST((len(text) - len(replace(text, pattern, '')))
                // len(pattern) AS BIGINT) AS n_hits
    FROM documents, pats
    WHERE len(text) - len(replace(text, pattern, '')) > 0
"""


@gate("multi_pattern_counts", _MP_SQL)
def q_multi_pattern_counts(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ops_text.multi_pattern_counts(docs, _MP_PATTERNS)

