"""Luby MIS invariants: independence, maximality, determinism under
repartitioning, and the gate budget decides every fixture node."""

import itertools

from pyspark.sql import Row

from pdal_spark.operators.graph import luby_mis


def _edges_df(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _check_mis(pairs, rows):
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = {n for e in es for n in e}
    mis = {r.node for r in rows if r.mis}
    decided = {r.node for r in rows}
    assert decided == nodes  # every node decided
    for a, b in es:  # independence
        assert not (a in mis and b in mis), (a, b)
    for v in nodes - mis:  # maximality
        assert any(
            (min(v, u), max(v, u)) in es for u in mis
        ), v


def test_clique_path_star_invariants(spark):
    pairs = (
        list(itertools.combinations(range(5), 2))       # K5 -> 1
        + [(10, 11), (11, 12), (12, 13), (13, 14)]      # path
        + [(20, i) for i in range(21, 27)]              # star
    )
    rows = luby_mis(_edges_df(spark, pairs), rounds=8).collect()
    _check_mis(pairs, rows)
    mis = {r.node for r in rows if r.mis}
    assert len(mis & set(range(5))) == 1  # exactly one from K5


def test_repartition_invariant(spark):
    pairs = [(i, (i * 7 + 3) % 40) for i in range(120)]
    e = _edges_df(spark, pairs)
    a = {(r.node, r.mis, r.round)
         for r in luby_mis(e, rounds=8).collect()}
    b = {(r.node, r.mis, r.round)
         for r in luby_mis(e.repartition(17), rounds=8).collect()}
    assert a == b and len(a) > 0


def test_gate_budget_decides_everything(spark):
    import pdal_spark.gates.gate_ext80 as g80

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        from pdal_spark.gates.gate_ext67 import _hb_edges

        e = _hb_edges(spark, sf)
        rows = luby_mis(e, rounds=g80._MIS_ROUNDS).collect()
        pairs = [(r.src, r.dst) for r in e.collect()]
        _check_mis(pairs, rows)
