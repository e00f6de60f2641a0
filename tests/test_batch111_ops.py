"""Invariant tests for batch 111: attribution models."""

from __future__ import annotations

from pdal_spark.operators.temporal import (
    ATTR_Q,
    attribution_shares,
    time_decay_attribution,
)


def _journeys(spark):
    # user 1: a -> b -> c ; user 2: b ; user 3: a -> c
    rows = [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"),
            (2, 1, "b"), (3, 1, "a"), (3, 2, "c")]
    return spark.createDataFrame(rows, "u long, o long, ch string")


def test_attribution_first_last_counts(spark):
    out = {r["ch"]: r for r in attribution_shares(
        _journeys(spark), "u", "o", "ch").collect()}
    assert out["a"]["n_first"] == 2 and out["a"]["n_last"] == 0
    assert out["c"]["n_last"] == 2
    assert out["b"]["n_first"] == 1 and out["b"]["n_last"] == 1


def test_attribution_linear_conserves_per_journey(spark):
    out = attribution_shares(_journeys(spark), "u", "o",
                             "ch").collect()
    total = sum(r["linear_q"] for r in out)
    # 3 journeys x ~Q each (len-3 journey loses 1 unit to
    # truncation: 3 * (Q div 3) = Q - 1)
    assert 3 * ATTR_Q - 3 <= total <= 3 * ATTR_Q


def test_attribution_position_u_shape(spark):
    # 4-touch journey: first/last get 2Q/5, mids (Q/5)/2
    rows = [(1, i, f"c{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "u long, o long, ch string")
    out = {r["ch"]: r["position_q"] for r in attribution_shares(
        df, "u", "o", "ch").collect()}
    assert out["c0"] == out["c3"] == (2 * ATTR_Q) // 5
    assert out["c1"] == out["c2"] == (ATTR_Q // 5) // 2


def test_time_decay_halves_per_halflife(spark):
    # distances 0, 10, 20 from last touch with halflife 10:
    # weights Q, Q/2, Q/4
    rows = [(1, 0, "old"), (1, 10, "mid"), (1, 20, "new")]
    df = spark.createDataFrame(rows, "u long, o long, ch string")
    out = {r["ch"]: r for r in time_decay_attribution(
        df, "u", "o", "ch", halflife=10).collect()}
    assert out["new"]["w_raw"] == ATTR_Q
    assert out["mid"]["w_raw"] == ATTR_Q // 2
    assert out["old"]["w_raw"] == ATTR_Q // 4
    # shares sum to ~Q per journey
    assert sum(r["share_q"] for r in out.values()) <= ATTR_Q
    assert sum(r["share_q"] for r in out.values()) >= ATTR_Q - 3
