"""Invariant tests for the batch-3 ops: the 1-D range join
(interval_join), the hypertable continuous-aggregate pyramid
(time_rollup), and their pipeline stages."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pdal_spark.operators.temporal import interval_join, time_rollup

_T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ts(s: int) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=s)


def _us(s: int) -> int:
    return int((_T0 + dt.timedelta(seconds=s)).replace(
        tzinfo=dt.timezone.utc
    ).timestamp() * 1_000_000)


def _events(spark, secs):
    return spark.createDataFrame(
        [Row(event_id=i, ts=_ts(s)) for i, s in enumerate(secs)]
    )


def _intervals(spark, spans):
    return spark.createDataFrame(
        [
            Row(iv_id=i, start_us=_us(a), end_us=_us(b))
            for i, (a, b) in enumerate(spans)
        ]
    )


def test_interval_join_matches_brute_force(spark):
    # events every 10 min for 6 h; intervals of assorted lengths,
    # several spanning multiple 1-h cells, one empty, one inverted.
    secs = list(range(0, 6 * 3600, 600))
    spans = [
        (0, 1800),          # within one cell
        (1700, 9000),       # spans 3 cells
        (3600, 3600),       # empty (start == end) -> no matches
        (9000, 5000),       # inverted -> dropped
        (20000, 21000),
    ]
    ev, iv = _events(spark, secs), _intervals(spark, spans)
    got = {
        (r["event_id"], r["iv_id"])
        for r in interval_join(ev, iv, cell_s=3600).collect()
    }
    want = {
        (i, j)
        for i, s in enumerate(secs)
        for j, (a, b) in enumerate(spans)
        if a <= s < b
    }
    assert got == want and want  # non-degenerate


def test_interval_join_half_open_bounds(spark):
    ev = _events(spark, [100, 200])
    iv = _intervals(spark, [(100, 200)])
    got = interval_join(ev, iv, cell_s=60).collect()
    # start inclusive, end exclusive
    assert [r["event_id"] for r in got] == [0]


def test_interval_join_cell_size_invariance(spark):
    secs = list(range(0, 7200, 300))
    spans = [(250, 4000), (3900, 7100)]
    ev, iv = _events(spark, secs), _intervals(spark, spans)
    a = sorted(
        (r["event_id"], r["iv_id"])
        for r in interval_join(ev, iv, cell_s=3600).collect()
    )
    b = sorted(
        (r["event_id"], r["iv_id"])
        for r in interval_join(ev, iv, cell_s=137).collect()
    )
    assert a == b


def test_time_rollup_parent_equals_child_sum(spark):
    rows = [
        Row(event_id=i, ts=_ts(i * 97), value=float(i % 7) - 3.0)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows)
    out = time_rollup(df, widths_s=[60, 3600]).collect()
    fine = [r for r in out if r["width_s"] == 60]
    coarse = {r["bucket_start_s"]: r for r in out if r["width_s"] == 3600}
    # every coarse bucket's (n, value_q_sum) == sum of its children
    agg: dict[int, list[int]] = {}
    for r in fine:
        p = (r["bucket_start_s"] // 3600) * 3600
        n, q = agg.setdefault(p, [0, 0])
        agg[p] = [n + r["n"], q + r["value_q_sum"]]
    assert set(agg) == set(coarse)
    for p, (n, q) in agg.items():
        assert coarse[p]["n"] == n and coarse[p]["value_q_sum"] == q
    assert sum(r["n"] for r in fine) == 500


def test_time_rollup_rejects_nondivisible_ladder(spark):
    df = _events(spark, [0]).withColumn("value", F.lit(1.0))
    with pytest.raises(ValueError):
        time_rollup(df, widths_s=[60, 90]).collect()


def test_interval_join_pipeline_stage(spark, tmp_path):
    from pdal_spark.plans.pipeline import Pipeline

    ev_p, iv_p = str(tmp_path / "ev"), str(tmp_path / "iv")
    _events(spark, [0, 600, 1200]).write.parquet(ev_p)
    _intervals(spark, [(0, 700)]).write.parquet(iv_p)
    p = Pipeline([
        {"type": "readers.parquet", "filename": ev_p, "tag": "ev"},
        {"type": "readers.parquet", "filename": iv_p, "tag": "iv"},
        {"type": "filters.interval_join", "cell_s": 600,
         "inputs": ["ev", "iv"]},
    ])
    assert p.execute(spark).count() == 2


def test_time_rollup_pipeline_stage(spark, tmp_path):
    from pdal_spark.plans.pipeline import Pipeline

    pth = str(tmp_path / "ev")
    _events(spark, [0, 30, 3700]).withColumn(
        "value", F.lit(2.0)
    ).write.parquet(pth)
    p = Pipeline([
        {"type": "readers.parquet", "filename": pth},
        {"type": "filters.time_rollup", "widths_s": [60, 3600]},
    ])
    out = p.execute(spark).collect()
    assert {(r["width_s"], r["n"]) for r in out} >= {(3600, 1)}
    assert sum(r["n"] for r in out if r["width_s"] == 60) == 3


# ---------------------------------------------------------------------------
# Product quantization (pq_codebook / pq_encode / pq_topk)
# ---------------------------------------------------------------------------

def _emb_rows(n, dim=16, seed=7):
    # deterministic integer-ish embeddings, no RNG state
    return [
        Row(
            vec_id=i,
            embedding=[
                float(((i * 37 + j * seed) % 19) - 9)
                for j in range(dim)
            ],
        )
        for i in range(n)
    ]


def test_pq_codebook_shape_and_determinism(spark):
    from pdal_spark.operators.similarity import pq_codebook

    emb = spark.createDataFrame(_emb_rows(40))
    cb = pq_codebook(emb, m=4, ncent=8).collect()
    assert len(cb) == 4 * 8
    assert all(len(r["cv"]) == 4 for r in cb)
    cb2 = pq_codebook(emb, m=4, ncent=8).collect()
    key = lambda r: (r["sub"], r["cid"])
    assert sorted(map(key, cb)) == sorted(map(key, cb2))


def test_pq_codebook_rejects_bad_m(spark):
    from pdal_spark.operators.similarity import pq_codebook

    emb = spark.createDataFrame(_emb_rows(10))
    with pytest.raises(ValueError):
        pq_codebook(emb, m=5)


def test_pq_encode_codes_come_from_codebook(spark):
    from pdal_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
    )

    emb = spark.createDataFrame(_emb_rows(40))
    cb = pq_codebook(emb, m=4, ncent=8)
    cids = {r["cid"] for r in cb.collect()}
    enc = pq_encode(emb, cb, m=4).collect()
    assert len(enc) == 40 * 4
    assert {r["code"] for r in enc} <= cids


def test_pq_twin_gets_identical_codes(spark):
    # a byte-identical twin MUST land on the same codes (same
    # quantization -> same integer d2 -> same argmin tie-break);
    # value-level ADC exactness is the pq_topk oracle gate's job.
    from pdal_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
    )

    rows = _emb_rows(40)
    rows.append(Row(vec_id=100, embedding=rows[3]["embedding"]))
    emb = spark.createDataFrame(rows)
    cb = pq_codebook(emb, m=4, ncent=8)
    enc = {
        (r["nb_id"], r["sub"]): r["code"]
        for r in pq_encode(emb, cb, m=4).collect()
    }
    assert all(enc[(100, s)] == enc[(3, s)] for s in range(4))


def test_pq_topk_deterministic_contiguous_ranks(spark):
    from pdal_spark.operators.similarity import pq_topk

    emb = spark.createDataFrame(_emb_rows(40))
    q = emb.where(F.col("vec_id") < 3)

    def snap():
        return sorted(
            (r["query_id"], r["sim_rank"], r["nb_id"], r["adc_score"])
            for r in pq_topk(q, emb, k=4, m=4, ncent=8).collect()
        )

    a = snap()
    assert a == snap()
    by_q: dict[int, list[int]] = {}
    for qid, rank, _, _ in a:
        by_q.setdefault(qid, []).append(rank)
    assert set(by_q) == {0, 1, 2}
    assert all(sorted(v) == [1, 2, 3, 4] for v in by_q.values())


def test_ivf_pq_full_probe_equals_plain_pq(spark):
    # probing every cell removes the IVF restriction entirely ->
    # candidate set == corpus -> IVF-PQ must reproduce pq_topk
    # row-for-row (same codes, same LUT, same ranks).
    from pdal_spark.operators.similarity import ivf_pq_topk, pq_topk

    emb = spark.createDataFrame(_emb_rows(40))
    q = emb.where(F.col("vec_id") < 3)
    a = sorted(
        tuple(r) for r in pq_topk(q, emb, k=4, m=4, ncent=8).collect()
    )
    b = sorted(
        tuple(r)
        for r in ivf_pq_topk(
            q, emb, k=4, nlist=6, nprobe=6, m=4, ncent=8
        ).collect()
    )
    assert a == b


def test_ivf_pq_candidates_respect_probes(spark):
    # with nprobe=1 every returned neighbor must live in the single
    # cell its query probed
    from pdal_spark.operators.similarity import (
        _assign_cells,
        ivf_centroids,
        ivf_pq_topk,
    )

    emb = spark.createDataFrame(_emb_rows(40))
    q = emb.where(F.col("vec_id") < 3)
    cents = ivf_centroids(emb, 6)
    inv = {
        r["nb_id"]: r["cell"]
        for r in _assign_cells(
            emb, cents, 1, "embedding", "vec_id", "nb_id"
        ).collect()
    }
    probe = {
        r["query_id"]: r["cell"]
        for r in _assign_cells(
            q, cents, 1, "embedding", "vec_id", "query_id"
        ).collect()
    }
    out = ivf_pq_topk(
        q, emb, k=4, nlist=6, nprobe=1, m=4, ncent=8
    ).collect()
    assert out and all(
        inv[r["nb_id"]] == probe[r["query_id"]] for r in out
    )


def test_time_rollup_single_scan_plan(spark, tmp_path):
    # the pyramid must read the raw table ONCE (explode-ladder fold),
    # not once per level (naive per-level union rescans)
    from pdal_spark.operators.temporal import time_rollup

    pth = str(tmp_path / "ev")
    _events(spark, list(range(0, 7200, 60))).withColumn(
        "value", F.lit(1.0)
    ).write.parquet(pth)
    df = spark.read.parquet(pth)
    plan = (
        time_rollup(df, widths_s=[60, 3600, 86400])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1


# ---------------------------------------------------------------------------
# anchor_stats / url_rules_filter
# ---------------------------------------------------------------------------

def test_anchor_stats_counts_and_top_anchor(spark):
    from pdal_spark.operators.textops import anchor_stats

    pages = spark.createDataFrame([
        Row(doc_id=1, html='<a href="https://X.com/a">good</a>'
                           '<a href="https://x.com/b">good</a>'
                           '<a href="/rel">skip</a>'),
        Row(doc_id=2, html='<a href="https://x.com/c">bad</a>'),
    ])
    out = {r["link_domain"]: r for r in anchor_stats(pages).collect()}
    assert set(out) == {"x.com"}  # host lowercased, relative dropped
    r = out["x.com"]
    assert r["n_links"] == 3 and r["n_docs"] == 2
    assert r["top_anchor"] == "good" and r["top_anchor_n"] == 2


def test_anchor_stats_lexical_tiebreak(spark):
    from pdal_spark.operators.textops import anchor_stats

    pages = spark.createDataFrame([
        Row(doc_id=1, html='<a href="https://y.com/">zz</a>'
                           '<a href="https://y.com/">aa</a>'),
    ])
    r = anchor_stats(pages).collect()[0]
    assert r["top_anchor"] == "aa" and r["top_anchor_n"] == 1


def test_url_rules_longest_prefix_wins(spark):
    from pdal_spark.operators.textops import url_rules_filter

    pages = spark.createDataFrame([
        Row(doc_id=1, url="https://a.com/private/x"),
        Row(doc_id=2, url="https://a.com/private/ok/page"),
        Row(doc_id=3, url="https://b.com/anything"),
    ])
    rules = spark.createDataFrame(
        [("https://a.com/private", False),
         ("https://a.com/private/ok", True)],
        "prefix string, allow boolean",
    )
    out = {r["doc_id"]: r for r in
           url_rules_filter(pages, rules).collect()}
    assert out[1]["allowed"] is False
    assert out[2]["allowed"] is True  # longer allow overrides deny
    assert out[3]["allowed"] is True  # default
    assert out[3]["rule_prefix"] is None


def test_url_rules_equal_length_allow_wins(spark):
    from pdal_spark.operators.textops import url_rules_filter

    pages = spark.createDataFrame([Row(doc_id=1, url="https://c.com/p")])
    rules = spark.createDataFrame(
        [("https://c.com/", False), ("https://c.com/", True)],
        "prefix string, allow boolean",
    )
    out = url_rules_filter(pages, rules).collect()[0]
    assert out["allowed"] is True


def test_url_rules_output_row_per_input_row(spark):
    from pdal_spark.operators.textops import url_rules_filter

    pages = spark.createDataFrame(
        [Row(doc_id=i, url="https://d.com/same") for i in range(5)]
    )
    rules = spark.createDataFrame(
        [("https://d.com", False)], "prefix string, allow boolean"
    )
    out = url_rules_filter(pages, rules).collect()
    assert len(out) == 5 and all(r["allowed"] is False for r in out)


# ---------------------------------------------------------------------------
# shard_assign (consistent hashing)
# ---------------------------------------------------------------------------

def test_shard_assign_rebalance_moves_only_to_new_shard(spark):
    from pdal_spark.operators.textops import shard_assign

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["shard"] for r in shard_assign(df, 8).collect()}
    b = {r["doc_id"]: r["shard"] for r in shard_assign(df, 9).collect()}
    moved = {k for k in a if a[k] != b[k]}
    # THE consistent-hashing contract: every moved key lands on the
    # NEW shard, and only a ~1/(n+1) fraction moves (hash % n would
    # move ~8/9 of them)
    assert moved and all(b[k] == 8 for k in moved)
    assert len(moved) < 300


def test_shard_assign_covers_all_shards(spark):
    from pdal_spark.operators.textops import shard_assign

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    got = {r["shard"] for r in shard_assign(df, 6).collect()}
    assert got == set(range(6))


def test_shard_assign_zero_shuffle_plan(spark):
    from pdal_spark.operators.textops import shard_assign

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    plan = (
        shard_assign(df, 8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_ams_f2_tracks_exact_second_moment(spark):
    from pyspark.sql import Row

    from pdal_spark.operators.sketch import ams_f2

    # skewed frequencies: exact F2 = sum freq^2 is dominated by the
    # hot key; the sketch must land within the AMS error envelope.
    rows = (
        [Row(item=0)] * 400
        + [Row(item=i % 50 + 1) for i in range(600)]
    )
    exact = 400**2 + sum(
        sum(1 for i in range(600) if i % 50 + 1 == v) ** 2
        for v in range(1, 51)
    )
    out = ams_f2(spark.createDataFrame(rows), "item", t=32).collect()[0]
    assert out["t"] == 32
    for est in (out["f2_med"], out["f2_mean"]):
        assert exact / 3 <= est <= exact * 3


def test_pca_components_recover_dominant_axis(spark):
    import numpy as np
    from pyspark.sql import Row

    from pdal_spark.operators.similarity import pca_components

    # points along axis 2 with small noise on axis 5: the top
    # component must align with axis 2.
    rng = np.random.RandomState(7)
    rows = []
    for i in range(300):
        v = np.zeros(8)
        v[2] = rng.randn() * 10.0
        v[5] = rng.randn() * 0.5
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    vals, comps = pca_components(
        spark.createDataFrame(rows), n_components=2, dims=8
    )
    assert vals[0] > vals[1] > 0
    assert abs(comps[0][2]) > 0.99
    assert abs(comps[1][5]) > 0.9


def test_random_walks_follow_edges_deterministically(spark):
    from pyspark.sql import Row

    from pdal_spark.operators.graph import random_walks

    pairs = [(i, (i * 3 + 1) % 10) for i in range(10)] + [
        (3, 7), (7, 2), (9, 9), (20, 21),  # 21 is a dead end
    ]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])
    out = random_walks(df, steps=4, n_walks=2).collect()
    adj = {}
    for a, b in {(a, b) for a, b in pairs if a != b}:
        adj.setdefault(a, set()).add(b)
    walks = {}
    for r in out:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    for wid, path in walks.items():
        assert path[0] == wid // 2  # start node
        for s in range(1, max(path) + 1):
            assert path[s] in adj[path[s - 1]], (wid, s)
        # a walk only stops early at a dead end
        if max(path) < 4:
            assert path[max(path)] not in adj
    # every non-isolated node launched n_walks walks
    starts = {wid for wid in walks}
    nodes = {n for e in pairs for n in e if e[0] != e[1]}
    assert starts == {n * 2 + w for n in nodes for w in (0, 1)}
    # bit-determinism across partitionings
    again = {
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(df.repartition(13), steps=4,
                              n_walks=2).collect()
    }
    assert again == {(r["walk_id"], r["step"], r["node"]) for r in out}


def test_cooccurrence_brute_force_and_cap(spark):
    import itertools as it

    from pyspark.sql import Row

    from pdal_spark.operators.stats import LIFT_Q, cooccurrence

    baskets = {
        1: {1, 2, 3},
        2: {1, 2},
        3: {2, 3},
        4: {1, 2, 3, 4, 5, 6},  # the mega-basket for the cap test
        5: {7},
    }
    rows = [Row(k=k, it=i) for k, s in baskets.items() for i in s]
    df = spark.createDataFrame(rows)

    def brute(bk, min_count):
        n = len(bk)
        cnt = {}
        for s in bk.values():
            for i in s:
                cnt[i] = cnt.get(i, 0) + 1
        out = {}
        pair = {}
        for s in bk.values():
            for a, b in it.combinations(sorted(s), 2):
                pair[(a, b)] = pair.get((a, b), 0) + 1
        for (a, b), c in pair.items():
            if c >= min_count:
                out[(a, b)] = (c, (c * n * LIFT_Q) // (cnt[a] * cnt[b]))
        return out

    got = {
        (r["item_a"], r["item_b"]): (r["pair_keys"], r["lift_q"])
        for r in cooccurrence(df, "k", "it", min_count=2).collect()
    }
    assert got == brute(baskets, 2)
    # cap drops basket 4 entirely
    capped = {
        (r["item_a"], r["item_b"]): (r["pair_keys"], r["lift_q"])
        for r in cooccurrence(df, "k", "it", min_count=1,
                              max_items_per_key=3).collect()
    }
    small = {k: v for k, v in baskets.items() if len(v) <= 3}
    assert capped == brute(small, 1)
