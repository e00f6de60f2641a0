"""image_ahash / ahash_pairs / cost_distance / od_flows behavior."""

from pdal_spark.operators.h3 import od_flows
from pdal_spark.operators.multimodal import (
    ahash_pairs,
    attach_binary,
    image_ahash,
)
from pdal_spark.operators.raster import FOCAL_Q, cost_distance
from pdal_spark.sqlgen import qcell_pack

RES = 4


def _cell(ix, iy):
    return int(eval(qcell_pack(str(ix), str(iy), RES)))


def test_ahash_identical_payloads_collide(spark):
    df = spark.createDataFrame(
        [(1, "abcdef" * 20), (2, "abcdef" * 20), (3, "zzz" * 40)],
        ["doc_id", "text"],
    )
    h = {r.doc_id: (r.ahash_hi, r.ahash_lo) for r in
         image_ahash(attach_binary(df), codec="fake").collect()}
    assert h[1] == h[2]
    # halves are 32-bit non-negative
    for hi, lo in h.values():
        assert 0 <= hi < (1 << 32) and 0 <= lo < (1 << 32)


def test_ahash_pairs_finds_exact_dups_and_respects_threshold(spark):
    df = spark.createDataFrame(
        [(1, "abcdef" * 20), (2, "abcdef" * 20), (3, "zzz" * 40)],
        ["doc_id", "text"],
    )
    h = image_ahash(attach_binary(df), codec="fake")
    out = {(r.id_a, r.id_b): r.hamming for r in
           ahash_pairs(h, max_hamming=0).collect()}
    assert out == {(1, 2): 0}


def test_ahash_pairs_matches_bruteforce(spark):
    # 40 docs; banding must find EXACTLY the brute-force pairs.
    df = spark.createDataFrame(
        [(i, f"doc {i % 7} " * (10 + i % 5)) for i in range(40)],
        ["doc_id", "text"],
    )
    h = image_ahash(attach_binary(df), codec="fake")
    rows = h.collect()
    brute = set()
    for a in rows:
        for b in rows:
            if a.doc_id < b.doc_id:
                d = (bin((a.ahash_hi ^ b.ahash_hi)).count("1")
                     + bin((a.ahash_lo ^ b.ahash_lo)).count("1"))
                if d <= 3:
                    brute.add((a.doc_id, b.doc_id, d))
    got = {(r.id_a, r.id_b, r.hamming) for r in
           ahash_pairs(h, max_hamming=3).collect()}
    assert got == brute and len(brute) > 0


def test_cost_distance_uniform_friction_prefers_straight(spark):
    # friction 1 everywhere on a 3-cell row: dist(east 2 steps) =
    # 2 edges * (1+1) * FOCAL_Q.
    cells = [( _cell(ix, 0), 1) for ix in range(3)]
    df = spark.createDataFrame(cells, ["cell", "x"])
    src = _cell(0, 0)
    out = {r.cell: r.dist for r in
           cost_distance(df, RES, sources=[src], rounds=4).collect()}
    assert out[src] == 0
    assert out[_cell(1, 0)] == 2 * FOCAL_Q
    assert out[_cell(2, 0)] == 4 * FOCAL_Q


def test_cost_distance_detours_around_expensive_cells(spark):
    # A--expensive--B in a straight line, cheap detour one row up:
    # straight = (1+100)Q + (100+1)Q = 202Q; detour over two
    # diagonals + ... detour (0,0)->(1,1)->(2,0): (1+1)*RT2 + (1+1)*RT2
    # ~ 5.66Q < 202Q.
    from pdal_spark.operators.raster import D8_RT2_Q
    cells = [(_cell(0, 0), 1), (_cell(1, 0), 100), (_cell(2, 0), 1),
             (_cell(1, 1), 1)]
    df = spark.createDataFrame(cells, ["cell", "x"])
    out = {r.cell: r.dist for r in
           cost_distance(df, RES, sources=[_cell(0, 0)],
                         rounds=6).collect()}
    assert out[_cell(2, 0)] == 4 * D8_RT2_Q  # the diagonal detour


def test_od_flows_counts_trips(spark):
    # user 1: moves far east; user 2: same cells; user 3: stays put.
    rows = [
        (1, 0, 10.0, 10.0), (1, 1, 10.0, 100.0),
        (2, 0, 10.0, 10.0), (2, 1, 10.0, 100.0),
        (3, 0, -40.0, -90.0), (3, 1, -40.0, -90.0),
    ]
    df = spark.createDataFrame(rows, ["k", "o", "lat", "lon"])
    out = {(r.o_cell, r.d_cell): r.n_trips for r in
           od_flows(df, key="k", order="o", res=6).collect()}
    assert sorted(out.values()) == [1, 2]
    # user 3's trip is a self-loop (o == d)
    assert any(o == d for (o, d) in out)
