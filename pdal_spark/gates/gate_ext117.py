"""Gate registry extension 117 — sequence-overlap/local-trend
batch: LCS pairs (anti-diagonal recursive oracle, the dtw_pairs
convention) and rolling OLS slope."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

# ---------------------------------------------------------------------------
# lcs_pairs — 24-hour count-class profiles per user bucket (the
# dtw_pairs fixture with symbols = count % 5)
# ---------------------------------------------------------------------------
_LC_KEYS = 6
_LC_N = 24
_US_PER_H = 3_600_000_000


def _lcs_sql() -> str:
    n1 = _LC_N - 1
    smax = 2 * _LC_N - 2
    lo1 = f"greatest(0, s + 1 - {n1})"
    lo0 = f"greatest(0, s - {n1})"
    lom1 = f"greatest(0, s - 1 - {n1})"
    i = f"({lo1} + x)"
    j = f"(s + 1 - {i})"
    up = (
        f"CASE WHEN {i} >= 1 THEN"
        f" coalesce(cur[{i} - 1 - ({lo0}) + 1], 0)"
        " ELSE 0 END"
    )
    left = (
        f"CASE WHEN {j} >= 1 THEN"
        f" coalesce(cur[{i} - ({lo0}) + 1], 0)"
        " ELSE 0 END"
    )
    diag = (
        f"CASE WHEN {i} >= 1 AND {j} >= 1 THEN"
        f" coalesce(prv[{i} - 1 - ({lom1}) + 1], 0)"
        " ELSE 0 END"
    )
    dlen = f"least({n1}, s + 1) - ({lo1}) + 1"
    return f"""
    WITH RECURSIVE counts AS MATERIALIZED (
      SELECT user_id % {_LC_KEYS} AS k,
             (epoch_us(ts) // {_US_PER_H}) % {_LC_N} AS h,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    keys AS MATERIALIZED (SELECT DISTINCT k FROM counts),
    hours AS (SELECT unnest(range({_LC_N})) AS h),
    dense AS MATERIALIZED (
      SELECT keys.k, hours.h,
             CAST(coalesce(c.c, 0) % 5 AS BIGINT) AS c
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
             [CASE WHEN va[1] = vb[1] THEN 1 ELSE 0 END] AS cur,
             CAST(NULL AS BIGINT[]) AS prv
      FROM pairs
      UNION ALL
      SELECT ka, kb, va, vb, s + 1,
             list_transform(range(0, {dlen}), x ->
               CASE WHEN va[{i} + 1] = vb[{j} + 1]
                 THEN {diag} + 1
                 ELSE greatest({up}, {left}) END),
             cur
      FROM dp WHERE s < {smax}
    )
    SELECT ka AS key_a, kb AS key_b, CAST(cur[1] AS BIGINT) AS lcs
    FROM dp WHERE s = {smax}
    """


@gate("lcs_pairs", _lcs_sql())
def q_lcs_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy(
        (F.col("user_id") % _LC_KEYS).alias("k"),
        (F.expr(f"unix_micros(cast(ts as timestamp))"
                f" div {_US_PER_H}") % _LC_N).alias("h"),
    ).agg(F.count(F.lit(1)).alias("c"))
    keys = counts.select("k").distinct()
    hours = counts.sparkSession.range(_LC_N).select(
        F.col("id").alias("h")
    )
    dense = (
        keys.crossJoin(hours)
        .join(counts, on=["k", "h"], how="left")
        .select(
            "k", "h",
            (F.coalesce(F.col("c"), F.lit(0)) % 5).alias("sym"),
        )
    )
    return ops_temporal.lcs_pairs(
        dense, key="k", order="h", value="sym"
    )


# ---------------------------------------------------------------------------
# rolling_slope — trailing-8 local trend per user cohort
# ---------------------------------------------------------------------------
_RS_W = 8
_RS_SLOPE = """
           case when n >= 2 then
             (cast(n as double)
              * cast(srv - (rmax - n + 1) * sv as double)
              - (cast(n as double) * (cast(n as double) - 1.0e0)
                 / 2.0e0) * cast(sv as double))
             / (cast(n as double)
                * (cast(n as double) * (cast(n as double) - 1.0e0)
                   * (2.0e0 * cast(n as double) - 1.0e0) / 6.0e0)
                - (cast(n as double) * (cast(n as double) - 1.0e0)
                   / 2.0e0) * (cast(n as double)
                   * (cast(n as double) - 1.0e0) / 2.0e0)) end
"""
_RS_SQL = f"""
    WITH r AS MATERIALIZED (
      SELECT user_id % 17 AS k, event_id AS o, event_id % 29 AS v,
             row_number() OVER (PARTITION BY user_id % 17
               ORDER BY event_id) AS rn
      FROM events
    ),
    agg AS (
      SELECT k, o, CAST(v AS BIGINT) AS v,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(v) OVER w AS BIGINT) AS sv,
             CAST(sum(rn * v) OVER w AS BIGINT) AS srv,
             CAST(max(rn) OVER w AS BIGINT) AS rmax
      FROM r
      WINDOW w AS (PARTITION BY k ORDER BY o
        ROWS BETWEEN {_RS_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT k AS user_id, o AS event_id, v, n,
           srv - (rmax - n + 1) * sv AS sxy,
           {_RS_SLOPE} AS slope
    FROM agg
"""


@gate("rolling_slope", _RS_SQL)
def q_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 17).alias("k"),
        F.col("event_id").alias("o"),
        (F.col("event_id") % 29).alias("v"),
    )
    out = ops_temporal.rolling_slope(
        ev, key="k", order="o", value="v", window=_RS_W
    )
    return out.select(
        F.col("k").alias("user_id"),
        F.col("o").alias("event_id"),
        F.col("v").cast("long").alias("v"),
        F.col("n").cast("long").alias("n"),
        "sxy", "slope",
    )
