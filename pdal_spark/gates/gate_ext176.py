"""Gate registry extension 176 — ranking batch: batch Elo with
unrolled-round oracle and Condorcet head-to-head audit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import sqlgen as G
from pdal_spark.gate import _t, gate
from pdal_spark.operators import graph as ops_graph

_EL_ROUNDS = 3
_EL_K = 32
_EL_Q = ops_graph.ELO_Q
_EL_QF = G.fnum(float(_EL_Q))
_EL_KF = G.fnum(float(_EL_K))
_EL_PRED = "event_id % 13 = 0"
_EL_A = "(user_id % 16)"
_EL_B = f"(CAST({G.lehmer2('event_id')} % 16 AS BIGINT))"
_EL_S = (
    f"(CASE WHEN {G.lehmer2('event_id * 3 + 1')} % 2 = 0"
    " THEN 2 ELSE 0 END)"
)
_EL_RND = "(event_id % 3)"


def _elo_sql(rounds: int) -> str:
    parts = [f"""
    WITH base AS MATERIALIZED (
      SELECT {_EL_RND} AS rnd, {_EL_A} AS a, {_EL_B} AS b,
             CAST({_EL_S} AS BIGINT) AS sa2
      FROM events WHERE {_EL_PRED} AND {_EL_A} <> {_EL_B}
    ),
    players AS MATERIALIZED (
      SELECT DISTINCT p FROM (
        SELECT a AS p FROM base UNION ALL SELECT b FROM base
      ) t
    ),
    r0 AS MATERIALIZED (
      SELECT p, CAST({ops_graph.ELO_START} * {_EL_Q} AS BIGINT)
               AS rq
      FROM players
    )"""]
    for i in range(rounds):
        ea = (
            "round(1.0e0 / (1.0e0 + power(10.0e0,"
            " (cast(rb as double) - cast(ra as double))"
            f" / ({_EL_QF} * 400.0e0))), 9)"
        )
        delta = (
            f"CAST(floor({_EL_KF} * (cast(sa2 as double) / 2.0e0"
            f" - {ea}) * {_EL_QF} + 0.5e0) AS BIGINT)"
        )
        parts.append(f""",
    j{i} AS MATERIALIZED (
      SELECT m.a, m.b, m.sa2, pa.rq AS ra, pb.rq AS rb
      FROM base m
      JOIN r{i} pa ON pa.p = m.a
      JOIN r{i} pb ON pb.p = m.b
      WHERE m.rnd = {i}
    ),
    d{i} AS MATERIALIZED (
      SELECT p, CAST(sum(d) AS BIGINT) AS dd FROM (
        SELECT a AS p, {delta} AS d FROM j{i}
        UNION ALL
        SELECT b, -({delta}) FROM j{i}
      ) t GROUP BY p
    ),
    r{i + 1} AS MATERIALIZED (
      SELECT r{i}.p,
             CAST(r{i}.rq + coalesce(d{i}.dd, 0) AS BIGINT) AS rq
      FROM r{i} LEFT JOIN d{i} ON r{i}.p = d{i}.p
    )""")
    parts.append(f"""
    SELECT p AS player, rq AS rating_q,
           cast(rq as double) / {_EL_QF} AS rating
    FROM r{rounds}""")
    return "".join(parts)


@gate("elo_batch", _elo_sql(_EL_ROUNDS))
def q_elo_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _t(spark, sf_dir, "events").where(_EL_PRED).select(
        F.expr(_EL_RND).alias("rnd"),
        F.expr(_EL_A).alias("a"),
        F.expr(f"cast({G.lehmer2('event_id')} % 16 as bigint)")
        .alias("b"),
        F.expr(
            f"case when {G.lehmer2('event_id * 3 + 1')} % 2 = 0"
            " then 2 else 0 end"
        ).cast("long").alias("sa2"),
    ).where(F.col("a") != F.col("b"))
    return ops_graph.elo_batch(
        m, rounds=_EL_ROUNDS, k_factor=_EL_K
    )


_CW_W = (
    f"(CASE WHEN {G.lehmer2('event_id * 3 + 1')} % 2 = 0"
    f" THEN {_EL_A} ELSE {_EL_B} END)"
)
_CW_SQL = f"""
    WITH m AS MATERIALIZED (
      SELECT {_EL_A} AS a, {_EL_B} AS b, {_CW_W} AS w
      FROM events WHERE {_EL_PRED} AND {_EL_A} <> {_EL_B}
    ),
    per AS (
      SELECT least(a, b) AS lo, greatest(a, b) AS hi,
             CAST(sum(CASE WHEN w = least(a, b) THEN 1 ELSE 0 END)
               AS BIGINT) AS wl,
             CAST(sum(CASE WHEN w = greatest(a, b) THEN 1
               ELSE 0 END) AS BIGINT) AS wh
      FROM m GROUP BY least(a, b), greatest(a, b)
    ),
    sides AS (
      SELECT lo AS cand,
             CASE WHEN wl > wh THEN 1 ELSE 0 END AS beat,
             CASE WHEN wl = wh THEN 1 ELSE 0 END AS tie
      FROM per
      UNION ALL
      SELECT hi, CASE WHEN wh > wl THEN 1 ELSE 0 END,
             CASE WHEN wl = wh THEN 1 ELSE 0 END
      FROM per
    ),
    agg AS (
      SELECT cand, CAST(count(*) AS BIGINT) AS n_others,
             CAST(sum(beat) AS BIGINT) AS n_beaten,
             CAST(sum(tie) AS BIGINT) AS n_tied
      FROM sides GROUP BY cand
    ),
    n_c AS (
      SELECT CAST(count(DISTINCT c) AS BIGINT) AS n_cands FROM (
        SELECT lo AS c FROM per UNION ALL SELECT hi FROM per
      ) t
    )
    SELECT cand, n_others, n_beaten, n_tied,
           CAST(CASE WHEN n_beaten = n_cands - 1 THEN 1 ELSE 0 END
             AS INT) AS is_condorcet
    FROM agg, n_c
"""


@gate("condorcet_winner", _CW_SQL)
def q_condorcet_winner(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    m = _t(spark, sf_dir, "events").where(_EL_PRED).select(
        F.expr(_EL_A).alias("a"),
        F.expr(f"cast({G.lehmer2('event_id')} % 16 as bigint)")
        .alias("b"),
        F.expr(
            f"case when {G.lehmer2('event_id * 3 + 1')} % 2 = 0"
            f" then {_EL_A}"
            f" else cast({G.lehmer2('event_id')} % 16 as bigint)"
            " end"
        ).alias("w"),
    ).where(F.col("a") != F.col("b"))
    return ops_graph.condorcet_winner(m)
