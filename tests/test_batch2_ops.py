"""Invariant tests for the round-1 continuation batch: SemDeDup,
C4 span-level corpus dedup, zonal statistics, KDE rasterization."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pdal_spark.operators.crop import zonal_stats
from pdal_spark.operators.dedup import span_corpus_dedup
from pdal_spark.operators.raster import kde_rasterize
from pdal_spark.operators.similarity import semdedup


def test_span_dedup_first_occurrence_survives(spark):
    # span size 2: doc 1 = [a b][c d], doc 2 repeats [a b] then adds
    # [e f]; doc 3 is entirely the duplicated span -> dropped.
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d"),
            Row(doc_id=2, text="a b e f"),
            Row(doc_id=3, text="a b"),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in span_corpus_dedup(docs, span_words=2).collect()
    }
    assert out[1]["text"] == "a b c d"
    assert out[2]["text"] == "e f"
    assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 1
    assert 3 not in out  # every span already seen -> doc drops (C4)


def test_span_dedup_repeat_within_doc(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="x y x y x y")])
    out = span_corpus_dedup(docs, span_words=2).collect()[0]
    assert out["text"] == "x y"
    assert out["n_spans"] == 3 and out["n_kept"] == 1


def test_semdedup_identical_vectors_keep_one(spark):
    # 3 identical vectors + 1 orthogonal: exactly one of the clones
    # (the smallest id) survives; the orthogonal one is untouched.
    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0]),
        Row(vec_id=2, embedding=[1.0, 0.0]),
        Row(vec_id=3, embedding=[1.0, 0.0]),
        Row(vec_id=4, embedding=[0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows)
    out = {r["vec_id"]: r["kept"] for r in
           semdedup(emb, threshold=0.97, nlist=2).collect()}
    assert out == {1: 1, 2: 0, 3: 0, 4: 1}


def test_zonal_stats_counts_and_mean(spark):
    # unit square zone: two points inside (values 2, 4), one outside
    sq = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"
    pts = spark.createDataFrame(
        [
            Row(lon=1.0, lat=1.0, value=2.0),
            Row(lon=5.0, lat=5.0, value=4.0),
            Row(lon=50.0, lat=50.0, value=100.0),
        ]
    )
    out = zonal_stats(pts, [(0, sq)], value="value").collect()
    assert len(out) == 1
    r = out[0]
    assert r["geom_id"] == 0 and r["n_points"] == 2
    assert r["vmin"] == 2.0 and r["vmax"] == 4.0
    assert r["vmean"] == pytest.approx(3.0, abs=1e-5)


def test_kde_point_at_cell_center_symmetric(spark):
    # one point exactly at the center of cell (5,5): its own cell
    # gets weight 1.0; the four edge-neighbors get equal weights.
    pts = spark.createDataFrame([Row(lon=5.5, lat=5.5)])
    out = kde_rasterize(
        pts, resolution=1.0, origin_x=0.0, origin_y=0.0,
        width=12, height=12, bandwidth=1.5,
    ).collect()
    d = {(r["cell_i"], r["cell_j"]): r["density"] for r in out}
    assert d[(5, 5)] == pytest.approx(1.0, abs=1e-5)
    nb = [d[(4, 5)], d[(6, 5)], d[(5, 4)], d[(5, 6)]]
    assert len(set(nb)) == 1  # exact symmetry (fixed-point sums)
    assert 0 < nb[0] < 1.0
    # corners at distance sqrt(2) > h=1.5? sqrt(2)=1.414 < 1.5: present
    assert d[(4, 4)] == pytest.approx(1.0 - 2.0 / 2.25, abs=1e-5)


def test_kde_respects_grid_clip(spark):
    pts = spark.createDataFrame([Row(lon=0.5, lat=0.5)])
    out = kde_rasterize(
        pts, resolution=1.0, origin_x=0.0, origin_y=0.0,
        width=2, height=2, bandwidth=1.5,
    ).collect()
    assert all(
        0 <= r["cell_i"] < 2 and 0 <= r["cell_j"] < 2 for r in out
    )


def test_kmv_distinct_estimate_accuracy(spark):
    from pyspark.sql import Row

    from pdal_spark.operators.sketch import kmv_sketch

    # one group with 1000 distinct elements, one with 10 (exact path)
    rows = [Row(g="big", e=i) for i in range(1000)] * 2 + [
        Row(g="small", e=i) for i in range(10)
    ]
    out = {r["g"]: r for r in
           kmv_sketch(spark.createDataFrame(rows), "g", "e",
                      k=64).collect()}
    assert out["small"]["est_q"] == 10  # below k -> exact
    est = out["big"]["est_q"]
    assert 700 <= est <= 1300  # KMV relative error ~1/sqrt(k-2)


def test_kmv_jaccard_identical_and_disjoint(spark):
    from pyspark.sql import Row

    from pdal_spark.operators.sketch import KMV_JACC_Q, kmv_jaccard

    rows = (
        [Row(g="a", e=i) for i in range(500)]
        + [Row(g="b", e=i) for i in range(500)]          # b == a
        + [Row(g="c", e=i + 10000) for i in range(500)]  # disjoint
    )
    df = spark.createDataFrame(rows)
    same = kmv_jaccard(df, "g", "e", ga="a", gb="b", k=32).collect()[0]
    assert same["jaccard_q"] == KMV_JACC_Q
    assert same["matches"] == same["n_union_kept"] == 32
    disj = kmv_jaccard(df, "g", "e", ga="a", gb="c", k=32).collect()[0]
    assert disj["matches"] == 0 and disj["jaccard_q"] == 0


def test_decayed_counts_halving_steps(spark):
    import datetime as dt

    from pyspark.sql import Row

    from pdal_spark.operators.temporal import decayed_counts

    ref = dt.datetime(2026, 1, 10)
    hl = 86400
    rows = [
        Row(k="x", ts=ref, ref=ref),                        # age 0
        Row(k="x", ts=ref - dt.timedelta(days=1), ref=ref),  # 1 hl
        Row(k="x", ts=ref - dt.timedelta(days=2), ref=ref),  # 2 hl
        Row(k="x", ts=ref + dt.timedelta(days=9), ref=ref),  # future
        Row(k="y", ts=ref - dt.timedelta(days=365), ref=ref),
    ]
    out = {r["k"]: r for r in decayed_counts(
        spark.createDataFrame(rows), key="k", ref_ts="ref",
        halflife_s=hl,
    ).collect()}
    w = 1 << 30
    assert out["x"]["decayed_q"] == w + w // 2 + w // 4 + w
    assert out["x"]["n_events"] == 4
    assert out["y"]["decayed_q"] == w >> 62  # floored to 0


def test_rp_sketch_known_signs_and_invariance(spark):
    from pyspark.sql import Row

    from pdal_spark.operators.similarity import _rp_sign, rp_sketch

    # a one-hot (max-abs = the hot dim) vector quantizes to 127 at
    # the hot dim and 0 elsewhere -> sketch[j] = 127 * sign(hot, j)
    dims, k = 8, 4
    rows = [
        Row(vec_id=i, embedding=[1.0 if d == i else 0.0
                                 for d in range(dims)])
        for i in range(dims)
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["vec_id"], r["j"]): r["rp_q"]
        for r in rp_sketch(df, out_dim=k, dims=dims).collect()
    }
    for i in range(dims):
        for j in range(k):
            assert got[(i, j)] == 127 * _rp_sign(i, j, k), (i, j)
    # partitioning invariance
    a = {tuple(r) for r in
         rp_sketch(df.repartition(1), out_dim=k, dims=dims).collect()}
    b = {tuple(r) for r in
         rp_sketch(df.repartition(7), out_dim=k, dims=dims).collect()}
    assert a == b
