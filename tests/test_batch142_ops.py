"""Invariant tests for batch 142: batch Elo, Condorcet."""

from __future__ import annotations

from pdal_spark.operators.graph import (
    ELO_Q,
    ELO_START,
    condorcet_winner,
    elo_batch,
)


def test_elo_winner_gains_symmetrically(spark):
    # one match, A beats B: A gains exactly what B loses (K/2 at
    # equal start)
    m = spark.createDataFrame(
        [(0, 1, 2, 2)], "rnd long, a long, b long, sa2 long"
    )
    out = {r["player"]: r for r in
           elo_batch(m, rounds=1, k_factor=32).collect()}
    assert out[1]["rating_q"] - ELO_START * ELO_Q \
        == -(out[2]["rating_q"] - ELO_START * ELO_Q)
    assert abs(out[1]["rating"] - 1516.0) < 0.01


def test_elo_favorite_gains_less(spark):
    # round 0 makes player 1 strong; in round 1 beating a weak
    # player yields a smaller gain than the first upset did
    m = spark.createDataFrame(
        [(0, 1, 2, 2), (1, 1, 3, 2)],
        "rnd long, a long, b long, sa2 long",
    )
    out = {r["player"]: r for r in
           elo_batch(m, rounds=2, k_factor=32).collect()}
    gain_round2 = out[1]["rating"] - 1516.0
    assert 0 < gain_round2 < 16.0


def test_condorcet_identifies_dominant(spark):
    # 1 beats 2 and 3; 2 beats 3
    rows = [(1, 2, 1), (1, 2, 1), (1, 3, 1), (2, 3, 2)]
    m = spark.createDataFrame(rows, "a long, b long, w long")
    out = {r["cand"]: r for r in condorcet_winner(m).collect()}
    assert out[1]["is_condorcet"] == 1
    assert out[2]["is_condorcet"] == 0
    assert out[1]["n_beaten"] == 2


def test_condorcet_cycle_has_no_winner(spark):
    rows = [(1, 2, 1), (2, 3, 2), (1, 3, 3)]
    m = spark.createDataFrame(rows, "a long, b long, w long")
    out = condorcet_winner(m).collect()
    assert all(r["is_condorcet"] == 0 for r in out)
