"""Gate registry extension 216 — chain-diagnostic batch: Geweke z
and split R-hat."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.gate import _t, gate
from pdal_spark.operators import temporal as ops_temporal

_GW_HP, _GW_TP = 10, 50


def _gw_mv(k: int) -> tuple[str, str]:
    m = f"(cast(s{k} as double) / cast(m{k} as double))"
    v = (
        f"((cast(m{k} as double) * cast(ss{k} as double)"
        f" - cast(s{k} as double) * cast(s{k} as double))"
        f" / (cast(m{k} as double)"
        f" * (cast(m{k} as double) - 1.0e0)))"
    )
    return m, v


_GW_M1, _GW_V1 = _gw_mv(1)
_GW_M2, _GW_V2 = _gw_mv(2)
_GW_SE = (
    f"sqrt({_GW_V1} / cast(m1 as double)"
    f" + {_GW_V2} / cast(m2 as double))"
)
_GW_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT v,
             CAST(row_number() OVER (ORDER BY o ASC) AS BIGINT)
               AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM s
    ),
    seg AS (
      SELECT v, n,
             CASE WHEN rn * 100 <= {_GW_HP} * n THEN 1
               WHEN (n - rn) * 100 < {_GW_TP} * n THEN 2
               ELSE 0 END AS seg
      FROM base
    ),
    agg AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(v) AS BIGINT) AS s,
             CAST(sum(v * v) AS BIGINT) AS ss,
             CAST(max(n) AS BIGINT) AS n
      FROM seg WHERE seg > 0 GROUP BY seg
    ),
    piv AS (
      SELECT n,
             CAST(max(CASE WHEN seg = 1 THEN m END) AS BIGINT)
               AS m1,
             CAST(max(CASE WHEN seg = 1 THEN s END) AS BIGINT)
               AS s1,
             CAST(max(CASE WHEN seg = 1 THEN ss END) AS BIGINT)
               AS ss1,
             CAST(max(CASE WHEN seg = 2 THEN m END) AS BIGINT)
               AS m2,
             CAST(max(CASE WHEN seg = 2 THEN s END) AS BIGINT)
               AS s2,
             CAST(max(CASE WHEN seg = 2 THEN ss END) AS BIGINT)
               AS ss2
      FROM agg GROUP BY n
    )
    SELECT CAST(n AS BIGINT) AS n, m1 AS n_head, m2 AS n_tail,
           CASE WHEN m1 > 1 AND m2 > 1 AND {_GW_SE} > 0.0e0 THEN
             ({_GW_M1} - {_GW_M2}) / {_GW_SE} END AS z
    FROM piv
"""


@gate("geweke_z", _GW_SQL)
def q_geweke_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.geweke_z(
        ev, order="o", value="v", head_pct=_GW_HP,
        tail_pct=_GW_TP,
    )


_SR_NH = "cast(nh as double)"


def _sr_var(s: str, ss: str) -> str:
    return (
        f"(({_SR_NH} * cast({ss} as double)"
        f" - cast({s} as double) * cast({s} as double))"
        f" / ({_SR_NH} * ({_SR_NH} - 1.0e0)))"
    )


_SR_W = f"(({_sr_var('s1', 'ss1')} + {_sr_var('s2', 'ss2')}) / 2.0e0)"
_SR_MD = (
    f"(cast(s1 as double) / {_SR_NH}"
    f" - cast(s2 as double) / {_SR_NH})"
)
_SR_B = f"({_SR_NH} * {_SR_MD} * {_SR_MD} / 2.0e0)"
_SR_RHAT = (
    f"sqrt((({_SR_NH} - 1.0e0) / {_SR_NH} * {_SR_W}"
    f" + {_SR_B} / {_SR_NH}) / {_SR_W})"
)
_SR_SQL = f"""
    WITH s AS MATERIALIZED (
      SELECT event_id AS o, CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    base AS MATERIALIZED (
      SELECT v,
             CAST(row_number() OVER (ORDER BY o ASC) AS BIGINT)
               AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM s
    ),
    halves AS (
      SELECT v,
             CASE WHEN rn <= n // 2 THEN 1 ELSE 2 END AS h
      FROM base WHERE rn <= 2 * (n // 2)
    ),
    agg AS (
      SELECT h, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(v) AS BIGINT) AS s,
             CAST(sum(v * v) AS BIGINT) AS ss
      FROM halves GROUP BY h
    ),
    piv AS (
      SELECT
        CAST(max(CASE WHEN h = 1 THEN m END) AS BIGINT) AS nh,
        CAST(max(CASE WHEN h = 1 THEN s END) AS BIGINT) AS s1,
        CAST(max(CASE WHEN h = 1 THEN ss END) AS BIGINT) AS ss1,
        CAST(max(CASE WHEN h = 2 THEN s END) AS BIGINT) AS s2,
        CAST(max(CASE WHEN h = 2 THEN ss END) AS BIGINT) AS ss2
      FROM agg
    )
    SELECT CAST(nh * 2 AS BIGINT) AS n, nh AS n_h,
           CASE WHEN nh > 1 AND {_SR_W} > 0.0e0 THEN {_SR_RHAT}
             END AS rhat
    FROM piv
"""


@gate("split_rhat", _SR_SQL)
def q_split_rhat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("o"),
        F.expr("cast(floor(value) as bigint)").alias("v"),
    )
    return ops_temporal.split_rhat(ev, order="o", value="v")
