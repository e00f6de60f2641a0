"""Bloom membership dedup, unigram-LM scoring, NB classifier
invariants (round-1 continuation webtext batch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdal_spark.operators import dedup as ops_dedup
from pdal_spark.operators import textops as ops_text

SF_SMOKE = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    bm = ops_dedup.bloom_build(corpus, m_bits=1 << 14, k=3)
    out = ops_dedup.bloom_member(docs, bm, m_bits=1 << 14, k=3)
    rows = {r.doc_id: r.in_bloom for r in out.collect()}
    assert len(rows) == docs.count()
    # every true member must flag (Bloom guarantees no false negatives)
    assert all(v for k, v in rows.items() if k % 2 == 0)
    # a reasonably sized bitmap keeps false positives rare
    fp = sum(1 for k, v in rows.items() if k % 2 == 1 and v)
    n_new = sum(1 for k in rows if k % 2 == 1)
    assert fp / n_new < 0.1


def test_bloom_bitmap_is_tiny(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bm = ops_dedup.bloom_build(docs, m_bits=1 << 14, k=3)
    assert bm.count() <= (1 << 14) // 64


def test_unigram_logprob_ranks_rare_tokens_lower(spark):
    rows = [(1, "common common common common"),
            (2, "common rareword common common")]
    big = [(100 + i, "common common common common") for i in range(40)]
    df = spark.createDataFrame(rows + big, ["doc_id", "text"])
    out = {r.doc_id: r for r in ops_text.unigram_logprob(df).collect()}
    assert out[1].lm_mean > out[2].lm_mean  # rare token drags doc down
    assert all(r.lm_mean < 0 for r in out.values())
    assert out[1].n_tokens == 4


def test_nb_classifier_separates_separable_corpus(spark):
    pos = [(i, "alpha beta gamma delta", "en") for i in range(20)]
    neg = [(100 + i, "uno dos tres cuatro", "es") for i in range(20)]
    df = spark.createDataFrame(pos + neg, ["doc_id", "text", "lang"])
    out = ops_text.nb_classifier(df, label_value="en")
    res = {r.doc_id: r.pred for r in out.collect()}
    assert all(res[i] for i, _, _ in pos)
    assert not any(res[i] for i, _, _ in neg)


def test_hll_estimate_within_error_bound(spark):
    from pdal_spark.operators import sketch as ops_sketch

    df = spark.range(20000).withColumnRenamed("id", "cell")
    row = ops_sketch.hll_estimate(df, "cell").collect()[0]
    # m=64 -> sigma ~ 1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(row.hll_est - 20000) / 20000 < 0.39
    assert row.n_used <= 64


def test_hll_registers_merge_associatively(spark):
    """Sketching halves separately and merging register maxes equals
    sketching the whole — the property that makes HLL distributable."""
    from pyspark.sql import functions as F

    from pdal_spark.operators import sketch as ops_sketch
    from pdal_spark import sqlgen as G

    whole = spark.range(5000).withColumnRenamed("id", "cell")

    def regs(df):
        h = G.mix_hash("`cell`")
        return (
            df.select(
                F.expr(f"({h} % 64)").alias("b"),
                F.expr(
                    ops_sketch.hll_rho_sql(f"(({h}) div 64)")
                ).alias("r"),
            )
            .groupBy("b").agg(F.max("r").alias("r"))
        )

    a = regs(whole.where("cell < 2500"))
    b = regs(whole.where("cell >= 2500"))
    merged = a.unionByName(b).groupBy("b").agg(F.max("r").alias("r"))
    direct = regs(whole)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_kmv_jaccard_close_to_truth(spark):
    from pdal_spark.operators import sketch as ops_sketch

    a = spark.range(0, 1000).withColumnRenamed("id", "e")
    b = spark.range(500, 1500).withColumnRenamed("id", "e")
    row = ops_sketch.kmv_overlap(a, b, "e", k=64).collect()[0]
    assert abs(row.jaccard_est - 1.0 / 3.0) < 0.2
    assert row.k_used == 64


def test_dsir_label_weights_prefer_target_like_docs(spark):
    from pdal_spark.operators import textops as ops_text

    pos = [(i, "alpha beta gamma delta", "en") for i in range(20)]
    neg = [(100 + i, "uno dos tres cuatro", "es") for i in range(20)]
    df = spark.createDataFrame(pos + neg, ["doc_id", "text", "lang"])
    out = {r.doc_id: r.dsir_w
           for r in ops_text.dsir_label_weights(df, "en").collect()}
    assert min(out[i] for i, _, _ in pos) > max(out[i] for i, _, _ in neg)


def test_asof_join_matches_pandas_merge_asof(spark):
    import pandas as pd

    from pdal_spark.operators.temporal import asof_join

    left = pd.DataFrame({
        "k": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime(
            ["2024-01-01 00:10", "2024-01-01 00:20", "2024-01-01 00:05",
             "2024-01-01 00:10", "2024-01-01 00:01"]),
        "lv": [10, 20, 5, 11, 1],
    })
    right = pd.DataFrame({
        "k": [1, 1, 2],
        "ts": pd.to_datetime(
            ["2024-01-01 00:07", "2024-01-01 00:15", "2024-01-01 00:03"]),
        "rv": [70, 150, 30],
    })
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="k"
    ).toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    exp = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k"
    ).sort_values(["k", "ts"]).reset_index(drop=True)
    assert list(out["rv_r"].fillna(-1)) == list(exp["rv"].fillna(-1))


def test_asof_join_tolerance(spark):
    import pandas as pd

    from pdal_spark.operators.temporal import asof_join

    left = spark.createDataFrame(pd.DataFrame({
        "k": [1], "ts": pd.to_datetime(["2024-01-01 01:00"]), "lv": [1]}))
    right = spark.createDataFrame(pd.DataFrame({
        "k": [1], "ts": pd.to_datetime(["2024-01-01 00:00"]), "rv": [9]}))
    hit = asof_join(left, right, on="k",
                    tolerance_us=3_600_000_000).collect()[0]
    miss = asof_join(left, right, on="k",
                     tolerance_us=3_599_000_000).collect()[0]
    assert hit.rv_r == 9 and miss.rv_r is None


def test_cms_never_underestimates_and_bounds_error(spark):
    from pyspark.sql import functions as F

    from pdal_spark.operators import sketch as ops_sketch

    # 2000 distinct elements in a 3x256 table -> collisions guaranteed
    df = spark.range(6000).select((F.col("id") % 2000).alias("e"))
    cms = ops_sketch.cms_build(df, "e")
    exact = df.groupBy("e").agg(F.count(F.lit(1)).alias("x"))
    est = ops_sketch.cms_estimate(exact.select("e"), cms, "e")
    j = exact.join(est, on="e").collect()
    assert all(r.cms_est >= r.x for r in j)
    # CM guarantee: err <= e/w * N with prob 1-exp(-d); check the
    # 99th percentile stays under 2*N/w = 2*6000/256
    errs = sorted(r.cms_est - r.x for r in j)
    assert errs[int(len(errs) * 0.99)] <= 2 * 6000 / 256


def test_bpe_train_hand_computed(spark):
    from pdal_spark.operators import textops as ops_text

    # corpus: "abab" x3, "ab" x2 -> pair (a,b) count 3*2+2 = 8 wins;
    # after merge 'ab': word1 = [ab, ab], word2 = [ab]; next best
    # pair is (ab, ab) with count 3
    docs = [(1, "abab abab abab ab ab")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    m = {r.rank: (r.lhs, r.rhs, r.total)
         for r in ops_text.bpe_train(df, n_merges=2).collect()}
    assert m[1] == ("a", "b", 8)
    assert m[2] == ("ab", "ab", 3)


def test_bpe_segment_roundtrip(spark):
    from pyspark.sql import functions as F

    from pdal_spark.operators import textops as ops_text

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    seg = ops_text.bpe_segment(docs, n_merges=4)
    rows = seg.collect()
    # segmentation concatenates back to the word, every word present
    for r in rows:
        assert "".join(x for x in r.s.split(",") if x) == r.word
        assert 1 <= r.n_symbols <= len(r.word)
    vocab_sz = docs.select(
        F.explode(F.split("text", " ")).alias("w")).distinct().count()
    assert len(rows) == vocab_sz


def test_weighted_sample_prefers_heavy_rows(spark):
    from pyspark.sql import functions as F

    from pdal_spark.operators.sampling import weighted_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, 50.0).otherwise(1.0).alias("w"),
    )
    s = weighted_sample(df, k=200, weight_col="w", id_col="doc_id")
    rows = [r.doc_id for r in s.collect()]
    assert len(rows) == 200 and len(set(rows)) == 200
    heavy = sum(1 for d in rows if d < 1000)
    assert heavy > 160  # 50x weight -> overwhelmingly heavy rows
    # deterministic across plans/partitionings
    s2 = weighted_sample(
        df.repartition(13), k=200, weight_col="w", id_col="doc_id")
    assert sorted(rows) == sorted(r.doc_id for r in s2.collect())


def test_stratified_sample_exact_quota(spark):
    from pyspark.sql import functions as F

    from pdal_spark.operators.sampling import stratified_sample

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    s = stratified_sample(ev, 7, "event_type", id_col="event_id")
    per = {r.event_type: r.n for r in s.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    n_types = ev.select("event_type").distinct().count()
    assert len(per) == n_types and all(v == 7 for v in per.values())


def test_allpairs_equals_brute_force(spark):
    """Prefix filtering is lossless: AllPairs output == the brute-
    force all-pairs join, in scale mode (xxhash shingles, no vocab)."""
    from pyspark.sql import functions as F

    from pdal_spark.operators import dedup as dd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ap = dd.allpairs_jaccard_pairs(docs, 1, 2)
    got = {(r.a, r.b, r.n_inter) for r in ap.collect()}

    sh = dd.shingles(docs, 3).distinct()
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    brute = (
        sh.select(F.col("doc_id").alias("a"), "shingle")
        .join(sh.select(F.col("doc_id").alias("b"), "shingle"),
              on="shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_inter"))
        .join(sz.withColumnRenamed("doc_id", "a")
              .withColumnRenamed("sz", "sz_a"), on="a")
        .join(sz.withColumnRenamed("doc_id", "b")
              .withColumnRenamed("sz", "sz_b"), on="b")
        .where(2 * F.col("n_inter")
               >= F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
    )
    want = {(r.a, r.b, r.n_inter) for r in brute.collect()}
    assert got == want and len(got) > 0


def test_hdr_quantile_error_bound(spark):
    """est <= exact quantile < est * (1 + 2^-sub_bits): the HDR
    relative-error contract, for every requested quantile."""
    import numpy as np
    from pyspark.sql import functions as F

    from pdal_spark.operators import sketch as sk

    orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).select(F.expr("cast(floor(o_totalprice) as bigint)").alias("v"))
    qs = [(1, 4), (1, 2), (3, 4), (9, 10), (99, 100)]
    est = {(r.q_num, r.q_den): r.est
           for r in sk.hdr_quantile(orders, "v", qs).collect()}
    vals = np.sort(orders.toPandas()["v"].values)
    n = len(vals)
    rel = 2.0 ** -sk.HDR_SUB_BITS
    for qn, qd in qs:
        exact = vals[-(-qn * n // qd) - 1]
        assert est[(qn, qd)] <= exact < est[(qn, qd)] * (1 + rel) + 1


def test_hdr_histogram_merges(spark):
    """Histograms of disjoint halves merge (sum cnt per bucket) into
    exactly the whole-input histogram — the mergeable-sketch
    property that makes the state partial/final-aggregation safe."""
    from pyspark.sql import functions as F

    from pdal_spark.operators import sketch as sk

    df = spark.range(1, 5000).select(
        (F.col("id") * F.col("id") % 99991 + 1).alias("v"))
    whole = {(r.bucket, r.lb): r.cnt
             for r in sk.hdr_histogram(df, "v").collect()}
    ha = sk.hdr_histogram(df.where("id % 2 = 0"), "v")
    hb = sk.hdr_histogram(df.where("id % 2 = 1"), "v")
    merged = {}
    for r in ha.unionByName(hb).collect():
        key = (r.bucket, r.lb)
        merged[key] = merged.get(key, 0) + r.cnt
    assert merged == whole


def test_hll_by_group_accuracy(spark):
    """Per-group HLL estimate within 3 sigma (1.04/sqrt(64)) of the
    exact per-group distinct count."""
    from pyspark.sql import functions as F

    from pdal_spark.operators import sketch as sk

    df = spark.range(30000).select(
        (F.col("id") % 7).alias("g"),
        ((F.col("id") * 2654435761) % 2500).alias("e"),
    )
    est = {r.g: r.hll_est for r in sk.hll_by_group(df, "e", "g").collect()}
    exact = {r.g: r.n for r in df.groupBy("g")
             .agg(F.count_distinct("e").alias("n")).collect()}
    for g, n in exact.items():
        assert abs(est[g] - n) <= 3 * 1.04 / (64 ** 0.5) * n + 2


def test_bigram_backoff_penalizes_unseen(spark):
    """Held-out scoring: a doc made of bigrams seen in training
    scores higher than one of the same unigrams in unseen order
    (the backoff penalty), and in-corpus self-scoring never fires
    the backoff branch (every bigram has c2 >= 1)."""
    from pdal_spark.operators.textops import bigram_logprob

    train = spark.createDataFrame(
        [(0, "a b c d a b c d a b c d")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(1, "a b c d a b"), (2, "b a d c b a")],
        "doc_id long, text string")
    out = {r.doc_id: r.lm2_mean
           for r in bigram_logprob(score, train_df=train).collect()}
    assert out[1] > out[2]
    self_sc = bigram_logprob(train).collect()[0]
    assert self_sc.n_bigrams == 11 and self_sc.lm2_mean > -1.2


def test_tfidf_topk_finds_exact_twin(spark):
    """A verbatim duplicate is the rank-1 lexical neighbor with
    cosine exactly 1.0 (identical tf-idf vectors)."""
    from pdal_spark.operators.similarity import tfidf_topk

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
            (3, "alpha zeta beta eta gamma theta"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk(docs, docs.where("doc_id = 0"), k=2).collect()
    top = {r.sim_rank: r for r in out}
    assert top[1].nb_id == 1 and top[1].cosine == 1.0
    assert top[2].cosine < 1.0


def test_extract_links_feeds_domain_authority(spark):
    """HTML payload -> extract_links -> domain link graph ->
    domain_authority pagerank, end to end: hub pages linked by every
    site must outrank leaf domains."""
    from pyspark.sql import functions as F

    from pdal_spark.operators.textops import domain_authority, extract_links

    ev = spark.range(200).select(F.col("id").alias("event_id"))
    html = F.concat(
        F.lit('<a href="https://site'), (F.col("event_id") % 13).cast("string"),
        F.lit('.example.com/p/1">a</a> <a href="https://hub.example.org/">h</a>'),
    )
    pages = ev.select(
        F.col("event_id").alias("doc_id"),
        F.encode(html, "utf-8").alias("html"),
        F.concat(F.lit("https://src"), (F.col("event_id") % 7).cast("string"),
                 F.lit(".example.net/page")).alias("url"),
    )
    links = extract_links(pages).where(F.col("link_domain").isNotNull())
    edges = (
        pages.select("doc_id", F.lower(F.regexp_extract(
            "url", "^https?://([^/]+)", 1)).alias("src_domain"))
        .join(links, on="doc_id")
        .select("src_domain", F.col("link_domain").alias("dst_domain"))
        .withColumnRenamed("src_domain", "src")
        .withColumnRenamed("dst_domain", "dst")
    )
    ranks = domain_authority(edges)
    cols = ranks.columns
    rank_col = [c for c in cols if "rank" in c or "authority" in c
                or c == "r"][0]
    node_col = [c for c in cols if c != rank_col][0]
    r = {getattr(row, node_col): getattr(row, rank_col)
         for row in ranks.collect()}
    hub = [k for k in r if "hub" in str(k)]
    assert hub, f"hub domain missing from {list(r)[:5]}"
    assert all(r[h] >= max(v for k, v in r.items() if "site" in str(k))
               for h in hub)


def test_sliding_windows_match_spark_builtin(spark):
    """The integer sliding-window explode reproduces F.window(ts,
    '15 minutes', '5 minutes') counts exactly."""
    from pyspark.sql import functions as F

    from pdal_spark.operators.temporal import sliding_window_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {(r.window_start_s, r.event_type): r.n
           for r in sliding_window_counts(ev, 900, 300).collect()}
    ref = {
        (int(r.w.start.timestamp()), r.event_type): r.n
        for r in ev.groupBy(
            F.window("ts", "15 minutes", "5 minutes").alias("w"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == ref


def test_char_entropy_known_values(spark):
    """Constant text has zero entropy; a uniform k-char alphabet has
    ln(k) (to the 2^-20 grid)."""
    import math

    from pdal_spark.operators.textops import char_entropy

    df = spark.createDataFrame(
        [(0, "aaaaaaaa"), (1, "abcd" * 6)], "doc_id long, text string")
    out = {r.doc_id: r for r in char_entropy(df).collect()}
    assert out[0].entropy == 0.0
    assert abs(out[1].entropy - math.log(4)) < 1e-5
    assert out[1].n_chars_e == 24


def test_score_percentile_matches_percent_rank_no_global_sort(spark):
    """Equals SQL percent_rank() (min-rank ties) and the data-sized
    side never enters a global Sort — only the tiny histogram does."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pdal_spark.operators.stats import score_percentile

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "n_chars")
    got = {r.doc_id: r.pct_rank
           for r in score_percentile(docs, "n_chars").collect()}
    ref = {r.doc_id: r.pr for r in docs.withColumn(
        "pr", F.percent_rank().over(Window.orderBy("n_chars"))
    ).collect()}
    assert got == ref
    plan = score_percentile(docs, "n_chars")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bootstrap_se_tracks_theory(spark):
    """Poisson-bootstrap SE of the mean is within 2x of the
    theoretical sigma/sqrt(n) on iid data, and every replica touches
    ~n rows (sum_w concentrates around n)."""
    import math

    from pyspark.sql import functions as F

    from pdal_spark.operators.stats import bootstrap_replicas

    n = 20000
    df = spark.range(n).select(
        F.col("id").alias("rid"), (F.col("id") % 100).alias("v"))
    reps = bootstrap_replicas(df, "v", "rid", n_replicas=16).collect()
    assert all(abs(r.sum_w - n) < 4 * math.sqrt(n) for r in reps)
    means = [r.mean_b for r in reps]
    mu = sum(means) / len(means)
    se = math.sqrt(sum((m - mu) ** 2 for m in means) / (len(means) - 1))
    sigma = math.sqrt((100 ** 2 - 1) / 12.0)  # uniform 0..99
    theory = sigma / math.sqrt(n)
    assert theory / 2 < se < theory * 2


def test_skew_report_flags_hot_key(spark):
    """A key holding half the rows gets share ~0.5 and a salt factor
    ~n_keys/2; uniform keys get salt 1."""
    from pyspark.sql import functions as F

    from pdal_spark.operators.stats import skew_report

    df = spark.range(10000).select(
        F.when(F.col("id") < 5000, 0).otherwise(F.col("id") % 100 + 1)
        .alias("k"))
    rep = skew_report(df, "k", top_k=3).collect()
    hot = rep[0]
    assert hot.k == 0 and abs(hot.share - 0.5) < 0.01
    assert hot.suggested_salt >= hot.n_keys // 2
    assert rep[1].suggested_salt == 1


def test_equi_depth_bins_match_ntile(spark):
    """Exact ntile semantics on a non-divisible total with ties."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pdal_spark.operators.stats import equi_depth_bins

    df = spark.range(103).select(
        F.col("id").alias("rid"), (F.col("id") % 17).alias("v"))
    got = {r.rid: r.bin
           for r in equi_depth_bins(df, "v", 7, "rid").collect()}
    ref = {r.rid: r.t for r in df.withColumn(
        "t", F.ntile(7).over(Window.orderBy("v", "rid"))).collect()}
    assert got == ref


def test_grouped_ols_recovers_line(spark):
    """y = 3x + 5 exactly -> slope 3.0, intercept 5.0 per group."""
    from pyspark.sql import functions as F

    from pdal_spark.operators.stats import grouped_ols

    df = spark.range(1000).select(
        (F.col("id") % 4).alias("g"),
        F.col("id").alias("x"),
        (F.col("id") * 3 + 5).alias("y"),
    )
    for r in grouped_ols(df, "x", "y", "g").collect():
        assert r.slope == 3.0 and r.intercept == 5.0


def test_event_transitions_rows_sum_to_one(spark):
    from pyspark.sql import functions as F

    from pdal_spark.operators.temporal import event_transitions

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    t = event_transitions(ev)
    sums = t.groupBy("from_state").agg(F.sum("p").alias("s")).collect()
    assert all(abs(r.s - 1.0) < 1e-9 for r in sums)
    n_pairs = t.agg(F.sum("n")).collect()[0][0]
    n_users_events = ev.groupBy("user_id").count().collect()
    expect = sum(r["count"] - 1 for r in n_users_events)
    assert n_pairs == expect


def test_funnel_strict_ordering(spark):
    """A user whose click precedes every view completes only step 1;
    a user with view < click < purchase completes all three."""
    import pandas as pd

    from pdal_spark.operators.temporal import funnel

    rows = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "event_type": ["view", "click", "purchase",
                       "click", "view"],
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 02:00",
            "2024-01-01 00:00", "2024-01-01 01:00"]),
    })
    out = {r.user_id: r for r in funnel(
        spark.createDataFrame(rows), ["view", "click", "purchase"]
    ).collect()}
    assert out[1].depth == 3
    assert out[2].depth == 1 and out[2].t_1 is None


def test_cohort_retention_age0_is_cohort_size(spark):
    from pyspark.sql import functions as F

    from pdal_spark.operators.temporal import cohort_retention

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ret = cohort_retention(ev, bucket_s=86400 * 7)
    r0 = {r.cohort_b: r.n_act for r in ret.where("age = 0").collect()}
    first = ev.select(
        "user_id",
        F.expr("(unix_timestamp(ts) div 604800)").alias("b")
    ).groupBy("user_id").agg(F.min("b").alias("cb"))
    sizes = {r.cb: r.n for r in first.groupBy("cb")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert r0 == sizes
    # retention never exceeds cohort size
    for r in ret.collect():
        assert r.n_act <= r0[r.cohort_b]


def test_sessionize_gap_rule(spark):
    """Events 10 min apart share a session; a >30 min gap starts a
    new one; session durations roll up exactly."""
    import pandas as pd

    from pdal_spark.operators.temporal import session_stats, sessionize

    rows = pd.DataFrame({
        "user_id": [1, 1, 1, 1],
        "event_id": [1, 2, 3, 4],
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 00:10",
            "2024-01-01 01:00", "2024-01-01 01:05"]),
    })
    df = spark.createDataFrame(rows)
    s = {r.event_id: r.session_n for r in sessionize(df, 1800).collect()}
    assert s == {1: 1, 2: 1, 3: 2, 4: 2}
    st = {r.session_n: (r.n_events, r.duration_s)
          for r in session_stats(df, 1800).collect()}
    assert st == {1: (2, 600), 2: (2, 300)}


def test_resize_nearest_matches_reference_loop(spark):
    """The vectorized NN resize equals a scalar reference loop over
    the same fake-codec pixels, and identity resize preserves sums."""
    import numpy as np
    from pyspark.sql import functions as F

    from pdal_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "hello world pixels"), (2, "abcdefgh" * 9)],
        "doc_id long, text string")
    wb = mm.attach_binary(docs)
    out = {r.doc_id: r for r in mm.resize_nearest(wb, 4, 3, codec="fake").collect()}
    meta = {r.doc_id: r for r in mm.decode_image_meta(wb, codec="fake").collect()}
    for did, text in [(1, "hello world pixels"), (2, "abcdefgh" * 9)]:
        b = text.encode()
        w, h = meta[did].width, meta[did].height
        src = mm._decode_pixels(b, w, h)
        ref = 0
        for y in range(3):
            for x in range(4):
                ref += int(src[(y * h) // 3, (x * w) // 4].sum())
        assert out[did].px_sum == ref and out[did].px_len == 36
    # identity resize: same grid, same checksum
    for did in (1, 2):
        w, h = meta[did].width, meta[did].height
        ident = {r.doc_id: r for r in
                 mm.resize_nearest(wb, w, h, codec="fake").collect()}
        full = mm._decode_pixels(
            ("hello world pixels" if did == 1 else "abcdefgh" * 9)
            .encode(), w, h)
        assert ident[did].px_sum == int(full.sum(dtype=np.int64))


def test_collocations_rank_by_glue_and_rarity(spark):
    """Perfectly-glued pairs outrank cross-boundary ones, and between
    perfect pairs the rarer one scores higher PMI: with every doc
    "new york <tail>", tails "a dog"/"the cat" (20 docs each) get
    ln(N/20) while the ubiquitous "new york" (40 docs) gets ln(N/40);
    the tie between the two tails breaks lexically."""
    from pdal_spark.operators.textops import collocations

    rows = [(i, "new york " + ("the cat" if i % 2 else "a dog"))
            for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    top = collocations(df, min_count=5, top_k=6).collect()
    order = [(r.w1, r.w2) for r in top]
    assert order[0] == ("a", "dog") and order[1] == ("the", "cat")
    assert order.index(("new", "york")) > 1
    pmi = {(r.w1, r.w2): r.pmi_q for r in top}
    assert pmi[("a", "dog")] == pmi[("the", "cat")]
    assert pmi[("new", "york")] < pmi[("a", "dog")]


def test_rrf_fusion_prefers_consensus(spark):
    """An item ranked 2nd by BOTH systems outscores items ranked 1st
    by only one (1/62+1/62 > 1/61 + nothing)."""
    from pdal_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 30, 2), (1, 40, 3)],
        "query_id long, nb_id long, sim_rank int")
    b = spark.createDataFrame(
        [(1, 20, 1), (1, 30, 2), (1, 50, 3)],
        "query_id long, nb_id long, sim_rank int")
    out = rrf_fuse([a, b], top_k=5).collect()
    ranks = {r.nb_id: r.fused_rank for r in out}
    assert ranks[30] == 1
    assert ranks[10] in (2, 3) and ranks[20] in (2, 3)


def test_batch2_ops_degenerate_inputs(spark):
    """k > n, single-row groups, empty frames: no crashes, sane
    shapes (the other-SF robustness the driver sweep implies)."""
    from pyspark.sql import functions as F

    from pdal_spark.operators.sampling import (
        stratified_sample,
        weighted_sample,
    )
    from pdal_spark.operators.sketch import hdr_quantile, hll_by_group
    from pdal_spark.operators.stats import (
        equi_depth_bins,
        grouped_ols,
        score_percentile,
        skew_report,
    )
    from pdal_spark.operators.temporal import (
        event_transitions,
        sliding_window_counts,
    )

    tiny = spark.range(3).select(
        F.col("id").alias("doc_id"), (F.col("id") + 1).alias("w"))
    assert weighted_sample(tiny, k=10, weight_col="w").count() == 3
    assert stratified_sample(
        tiny.withColumn("g", F.lit("x")), 10, "g", id_col="doc_id"
    ).count() == 3

    empty = tiny.where("doc_id < 0")
    assert hdr_quantile(empty, "w").count() == 0
    assert skew_report(empty, "w").count() == 0
    assert hll_by_group(empty, "w", "doc_id").count() == 0
    assert grouped_ols(tiny, "doc_id", "w", "w").count() == 3
    # single-value column: every row bin 1 region
    one = equi_depth_bins(
        tiny.withColumn("v", F.lit(7)), "v", 4, "doc_id")
    assert {r.bin for r in one.collect()} <= {1, 2, 3, 4}
    pct = score_percentile(tiny.withColumn("v", F.lit(7)), "v")
    assert all(r.pct_rank == 0.0 for r in pct.collect())

    import pandas as pd
    ev1 = spark.createDataFrame(pd.DataFrame({
        "user_id": [1], "event_id": [1], "event_type": ["view"],
        "ts": pd.to_datetime(["2024-01-01"])}))
    assert event_transitions(ev1).count() == 0
    assert sliding_window_counts(ev1, 900, 300).count() == 3


def test_dsir_weights_prefer_target_like_docs(spark):
    from pyspark.sql import Row

    from pdal_spark.operators.textops import dsir_weights

    # target-like docs repeat the "alpha beta" vocabulary; off-target
    # docs use disjoint words. DSIR must rank target-like raw docs
    # above off-target ones, and n_tokens must count every token.
    tgt_words = "alpha beta gamma delta"
    off_words = "zeta eta theta iota"
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=tgt_words) for i in range(6)]
        + [Row(doc_id=100 + i, text=off_words) for i in range(6)]
    )
    target = corpus.where("doc_id < 3")
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_q"])
        for r in dsir_weights(corpus, target, buckets=16).collect()
    }
    assert all(got[i][0] == 4 for i in got)
    assert min(got[i][1] for i in range(6)) > max(
        got[100 + i][1] for i in range(6)
    )


def test_dsir_weights_partitioning_invariant(spark):
    from pyspark.sql import Row

    from pdal_spark.operators.textops import dsir_weights

    rows = [
        Row(doc_id=i, text=" ".join(
            f"w{(i * 7 + j) % 13}" for j in range(10)
        ))
        for i in range(40)
    ]
    corpus1 = spark.createDataFrame(rows).repartition(1)
    corpus16 = spark.createDataFrame(rows).repartition(16)
    t1 = corpus1.where("doc_id % 5 = 0")
    t16 = corpus16.where("doc_id % 5 = 0")
    a = {tuple(r) for r in dsir_weights(corpus1, t1).collect()}
    b = {tuple(r) for r in dsir_weights(corpus16, t16).collect()}
    assert a == b


def test_bm25_prefers_rare_term_matches(spark):
    from pyspark.sql import Row

    from pdal_spark.operators.textops import bm25_topk

    # "rare" appears in one doc, "common" in all: BM25 must rank the
    # rare-term doc first for the query {rare, common}; a doc with
    # neither term scores nothing (absent from output).
    docs = [
        Row(doc_id=1, text="common rare common filler filler"),
        Row(doc_id=2, text="common filler filler filler filler"),
        Row(doc_id=3, text="common common filler filler filler"),
        Row(doc_id=4, text="nothing here at all whatsoever"),
    ]
    out = bm25_topk(
        spark.createDataFrame(docs), terms=["rare", "common"], k=10
    ).collect()
    assert [r["doc_id"] for r in out][0] == 1
    assert {r["doc_id"] for r in out} == {1, 2, 3}
    ranks = [r["rank"] for r in out]
    assert ranks == sorted(ranks) == list(range(1, len(out) + 1))


def test_bm25_length_normalization(spark):
    from pyspark.sql import Row

    from pdal_spark.operators.textops import bm25_topk

    # same tf for the query term; the shorter doc must outrank the
    # longer one (the b-term at work).
    docs = [
        Row(doc_id=1, text="term " + "pad " * 3),
        Row(doc_id=2, text="term " + "pad " * 40),
    ]
    out = {r["doc_id"]: r["rank"] for r in bm25_topk(
        spark.createDataFrame(docs), terms=["term"], k=5
    ).collect()}
    assert out[1] < out[2]
