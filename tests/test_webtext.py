"""Webtext ops: LSH recall vs brute force, multimodal plumbing,
dedup behaviors not covered by hash gates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdal_spark.operators import dedup as D
from pdal_spark.operators import multimodal as M
from pdal_spark.operators import similarity as S
from pdal_spark.operators import textops as T


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(50)]
    texts, rows = [], []
    for i in range(80):
        words = list(rng.choice(vocab, size=40))
        texts.append(" ".join(words))
    for i in range(80):
        rows.append((i, texts[i]))
    # exact dups
    rows.append((100, texts[0]))
    rows.append((101, texts[1]))
    # near dup: one word changed
    nd = texts[2].split()
    nd[5] = "CHANGED"
    rows.append((102, " ".join(nd)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    return spark.createDataFrame(pdf), pdf


def test_exact_dedup_finds_dups(docs_with_dups):
    sdf, _ = docs_with_dups
    out = D.exact_dedup(sdf).toPandas()
    dups = out[out.dup_cnt > 1]
    assert len(dups) == 2
    assert set(dups.canonical_id) == {0, 1}


def test_minhash_lsh_finds_near_dup(docs_with_dups):
    sdf, _ = docs_with_dups
    pairs = D.minhash_lsh_dedup(sdf, threshold=0.7).toPandas()
    got = set(zip(pairs.a, pairs.b))
    assert (0, 100) in got and (1, 101) in got  # exact dups: jacc=1
    assert (2, 102) in got  # near dup survives banding + threshold


def test_simhash_exact_dups_collide(docs_with_dups):
    sdf, _ = docs_with_dups
    sims = D.simhash(sdf).toPandas().set_index("doc_id")["simhash"]
    assert sims[0] == sims[100] and sims[1] == sims[101]
    buckets = D.simhash_dup_buckets(D.simhash(sdf)).toPandas()
    assert len(buckets) >= 2


def test_xxhash_mode_consistent(docs_with_dups):
    """Scale mode (no vocab) produces the same dup/near-dup structure."""
    sdf, _ = docs_with_dups
    pairs = D.minhash_lsh_dedup(sdf, threshold=0.9, vocab_df=None)
    got = set(map(tuple, pairs.select("a", "b").toPandas().to_numpy()))
    assert (0, 100) in got and (1, 101) in got


def test_lsh_near_dup_recall_vs_brute(spark):
    rng = np.random.default_rng(21)
    base = rng.normal(0, 1, (60, 64))
    # 10 near-duplicate rows: tiny perturbation of the first 10
    near = base[:10] + rng.normal(0, 0.01, (10, 64))
    vecs = np.vstack([base, near]).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": range(70), "embedding": [v.tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    out = S.lsh_near_dup(df, threshold=0.99, bands=8, n_planes=16)
    got = set(map(tuple, out.select("a", "b").toPandas().to_numpy()))
    expected = {(i, i + 60) for i in range(10)}
    recall = len(got & expected) / len(expected)
    assert recall >= 0.8  # banding recall on near-identical vectors
    assert all(
        a < b for a, b in got
    )


def test_ivf_topk_overlaps_brute(spark):
    rng = np.random.default_rng(22)
    vecs = rng.normal(0, 1, (100, 64)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": range(100), "embedding": [v.tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    brute = S.cosine_topk(df.limit(10), df, k=5).toPandas()
    approx = S.ivf_topk(df.limit(10), df, k=5, n_probe_bits=4).toPandas()
    # approximate: every returned neighbor must share the bucket AND
    # ranks must be internally consistent
    assert approx.groupby("query_id")["sim_rank"].max().le(5).all()
    # sanity: some overlap with brute-force truth
    b = set(zip(brute.query_id, brute.nb_id))
    a = set(zip(approx.query_id, approx.nb_id))
    assert len(a & b) > 0


def test_multimodal_plumbing(spark, docs_with_dups):
    sdf, pdf = docs_with_dups
    wb = M.attach_binary(sdf)
    meta = M.decode_image_meta(wb, codec="fake").toPandas().set_index("doc_id")
    exp_len = pdf.set_index("doc_id")["text"].str.len()
    assert (meta["byte_len"] == exp_len.loc[meta.index]).all()
    assert ((meta["width"] >= 1) & (meta["width"] <= 640)).all()
    feats = M.extract_features(wb, codec="fake")
    row = feats.first()
    assert len(row["feature"]) == M.FEATURE_DIM
    assert abs(sum(row["feature"]) - 1.0) < 1e-9
    frames = M.sample_frames(wb, every=50, codec="fake")
    f = frames.toPandas()
    assert (f.groupby("doc_id")["frame_idx"].min() == 0).all()
    with pytest.raises(NotImplementedError):
        M.resize_stub()


def test_langid_and_fingerprint_order_sensitivity(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a b c d", "d c b a"],  # same bag, different order
        }
    )
    df = spark.createDataFrame(pdf)
    v = T.vocab(df)
    fp = T.fingerprint(df, v).toPandas().set_index("doc_id")["fingerprint"]
    assert fp[0] != fp[1]
    lid = T.lang_id(df, v, n_groups=2).toPandas()
    assert set(lid.columns) == {"doc_id", "pred_lang"}


def test_repetition_stats_hand_computed(spark):
    # "a a a b": 4 tokens, 2 distinct -> dup_word_frac = 0.5;
    # bigrams: (a,a)x2, (a,b)x1 -> top covered = 2*(1+1) = 4 of
    # word_chars 4 -> top_bigram_frac = 1.0
    df = spark.createDataFrame(
        [(0, "a a a b"), (1, "x y")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in T.repetition_stats(df).collect()
    }
    assert out[0]["n_tokens"] == 4
    assert out[0]["dup_word_frac"] == pytest.approx(0.5)
    assert out[0]["top_bigram_frac"] == pytest.approx(1.0)
    assert out[1]["dup_word_frac"] == 0.0
    assert out[1]["top_bigram_frac"] == pytest.approx(1.0)


def test_keyword_topk_ranks_rare_terms_first(spark):
    # 'common' appears in both docs (df=2); 'rare' only in doc 0
    # (df=1). Equal tf -> df ASC puts 'rare' ahead of 'common'.
    df = spark.createDataFrame(
        [(0, "rare common"), (1, "common other")], ["doc_id", "text"]
    )
    out = T.keyword_topk(df, k=1).collect()
    top = {r["doc_id"]: r["word"] for r in out}
    assert top[0] == "rare"
    assert top[1] == "other"


def test_commonness_and_frequent_shingles(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e"), (2, "a b c d e"),
         (3, "v w x y z")],
        ["doc_id", "text"],
    )
    com = {r["doc_id"]: r["mean_df"]
           for r in T.commonness_score(df).collect()}
    assert com[0] == pytest.approx(3.0)   # every token in 3 docs
    assert com[3] == pytest.approx(1.0)   # unique vocab
    fs = {r["doc_id"]: r["common_frac"]
          for r in D.frequent_shingle_fraction(df, 2).collect()}
    # docs 0-2 share all 3-gram shingles (each shingle in 3 docs > 2)
    assert fs[0] == pytest.approx(1.0)
    assert fs[3] == pytest.approx(0.0)


def test_duplicated_span_stats_hand_computed(spark):
    """Two docs share an exact 12-word prefix (>= width=10), third is
    unique: shared spans cover exactly the first 12 tokens of each
    copy; the unique doc gets dup_frac 0."""
    shared = " ".join(f"s{i}" for i in range(12))
    rows = [
        (1, shared + " tail one alpha"),
        (2, shared + " other ending beta"),
        (3, " ".join(f"u{i}" for i in range(15))),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in D.duplicated_span_stats(docs, width=10).collect()
    }
    # spans starting at pos 0..2 are identical across docs 1 and 2 ->
    # covered positions 0..11 (3 starts x width 10, overlapping)
    assert out[1].n_tokens == 15 and out[1].dup_tokens == 12
    assert out[2].dup_tokens == 12
    assert out[3].dup_tokens == 0 and out[3].dup_frac == 0.0
    assert abs(out[1].dup_frac - 12 / 15) < 1e-15


def test_duplicated_span_within_doc_repeat(spark):
    """A 10-gram repeated twice INSIDE one doc counts (corpus-wide
    occurrence count includes within-document repeats)."""
    ten = " ".join(f"r{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, ten + " mid " + ten)], ["doc_id", "text"]
    )
    out = D.duplicated_span_stats(docs, width=10).collect()[0]
    assert out.n_tokens == 21
    assert out.dup_tokens == 20  # both copies covered, "mid" not


def test_decontaminate_flags_shared_ngrams(spark):
    # train doc 1 shares a 3-gram run with the eval doc; doc 2 does not
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zig zag zog quux")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(90, "prefix alpha beta gamma suffix")], "doc_id long, text string"
    )
    out = (
        D.decontaminate(train, ev)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 1: shingles {alpha-beta-gamma, beta-gamma-delta}; first hits
    assert out.loc[1, "n_shingles"] == 2
    assert out.loc[1, "contaminated"] == 1
    assert out.loc[1, "is_contaminated"] == 1
    assert out.loc[1, "contamination_frac"] == pytest.approx(0.5)
    assert out.loc[2, "contaminated"] == 0
    assert out.loc[2, "is_contaminated"] == 0


def test_domain_stats_shares_sum_to_one(spark):
    df = spark.createDataFrame(
        [
            ("https://a.com/x",),
            ("https://a.com/y",),
            ("https://b.org/z",),
            ("https://c.net/w",),
        ],
        "url string",
    )
    out = T.domain_stats(df).toPandas().set_index("domain")
    assert out.loc["a.com", "n_pages"] == 2
    assert out["share"].sum() == pytest.approx(1.0)
    assert out.loc["a.com", "share"] == pytest.approx(0.5)


def test_remove_duplicated_spans_cuts_shared_run(spark):
    # a 3-token span shared by docs 1 and 2; doc 3 untouched
    df = spark.createDataFrame(
        [
            (1, "a b c x y"),
            (2, "q a b c r"),
            (3, "u v w s t"),
        ],
        "doc_id long, text string",
    )
    out = (
        D.remove_duplicated_spans(df, width=3, min_count=2)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "text_clean"] == "x y"
    assert out.loc[2, "text_clean"] == "q r"
    assert out.loc[3, "text_clean"] == "u v w s t"
    assert out.loc[1, "kept_tokens"] == 2
    assert (out["n_tokens"] == 5).all()


def test_remove_duplicated_spans_fully_duplicated_doc(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    out = (
        D.remove_duplicated_spans(df, width=3, min_count=2)
        .toPandas()
        .set_index("doc_id")
    )
    assert (out["text_clean"] == "").all()
    assert (out["kept_tokens"] == 0).all()


def test_consistent_sample_deterministic_and_entity_consistent(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    from pdal_spark.operators import sampling as SA

    a = {r.doc_id for r in SA.consistent_sample(df, 0.3).collect()}
    b = {r.doc_id for r in SA.consistent_sample(df, 0.3).collect()}
    assert a == b  # pure function of the id
    assert 0.2 < len(a) / 2000 < 0.4
    # same ids survive when sampling a DIFFERENT table on the same key
    other = df.withColumn("x", F.col("doc_id") * 2)
    c = {r.doc_id for r in SA.consistent_sample(other, 0.3).collect()}
    assert a == c
    # a higher rate is a superset (nested samples)
    d = {r.doc_id for r in SA.consistent_sample(df, 0.6).collect()}
    assert a <= d
    # different salt -> a different (independent) draw
    e = {r.doc_id for r in SA.consistent_sample(df, 0.3, salt=5).collect()}
    assert a != e


def test_domain_cap_keeps_at_most_cap_per_domain(spark):
    rows = [(f"https://d{i % 3}.com/p{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "url string")
    out = T.domain_cap(df, cap=4).toPandas()
    per = out["url"].str.extract(r"https://(d\d)")[0].value_counts()
    assert (per == 4).all() and len(per) == 3
    # deterministic choice: first 4 urls per domain in url order
    assert set(out["url"]) == {
        f"https://d{d}.com/p{i}"
        for d in range(3)
        for i in sorted(
            [j for j in range(30) if j % 3 == d],
            key=lambda j: f"p{j}",
        )[:4]
    }


def test_simhash_near_dup_hamming_band_trick(spark):
    # signatures chosen so hamming distances are known:
    # 1-2: 1 bit apart; 1-3: 2 bits; 1-4: 5 bits (not a near-dup)
    sims = spark.createDataFrame(
        [
            (1, 0b0000000000000000),
            (2, 0b0000000000000001),
            (3, 0b0000000000000011),
            (4, 0b0000000000011111),
        ],
        "doc_id long, simhash long",
    )
    out = D.simhash_near_dup(sims, k=2).toPandas()
    pairs = {(r.a, r.b): r.hamming for r in out.itertuples()}
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 2
    assert pairs[(2, 3)] == 1
    assert (1, 4) not in pairs  # hamming 5 > k
    assert all(h <= 2 for h in pairs.values())


def test_ivf_trained_topk_recall_vs_brute(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    brute = S.cosine_topk(q, emb, k=3).toPandas()
    ivf = S.ivf_trained_topk(q, emb, k=3, nlist=8, nprobe=4).toPandas()
    bset = set(zip(brute.query_id, brute.nb_id))
    iset = set(zip(ivf.query_id, ivf.nb_id))
    # probing half the cells must recover a solid share of true NNs
    recall = len(bset & iset) / len(bset)
    assert recall >= 0.5
    # every query got k results and ranks are 1..k
    per = ivf.groupby("query_id")["sim_rank"].agg(["count", "max"])
    assert (per["count"] == 3).all() and (per["max"] == 3).all()


def test_sequence_pack_conservation(spark):
    """Concat-and-chunk invariants: offsets tile the token stream
    with no gaps, every non-tail pack holds exactly seq_len tokens,
    and every doc starts in exactly one pack."""
    from pdal_spark.operators import textops as TX

    docs = spark.range(0, 120).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("w "), F.repeat(F.lit("x y z "), (F.col("id") % 9 + 1).cast("int")),
            F.lit("end"),
        ).alias("text"),
    )
    per = TX.sequence_pack(docs, seq_len=16).orderBy("doc_id").toPandas()
    # exclusive prefix sum: each doc starts where the previous ended
    assert (per["start_tok"].iloc[0]) == 0
    assert (
        per["start_tok"].iloc[1:].values
        == (per["start_tok"] + per["n_tokens"]).iloc[:-1].values
    ).all()
    packs = TX.pack_manifest(docs, seq_len=16).toPandas()
    total = per["n_tokens"].sum()
    assert packs["n_tokens"].sum() == total
    tail = packs["pack_id"].max()
    assert (packs[packs.pack_id != tail]["n_tokens"] == 16).all()
    assert packs["n_doc_starts"].sum() == 120


def test_winnow_scale_mode_invariants(spark, docs_with_dups):
    """Row-local (xxhash) winnowing: exact-duplicate docs share the
    full fingerprint set; selection density is ~2/(w+1) of shingles;
    every fingerprint is one of the doc's own shingle hashes."""
    sdf, _ = docs_with_dups
    w = 4
    fp = D.winnow_fingerprints(sdf, w=w).toPandas()
    sh = D.shingles(sdf).toPandas()
    # doc 100 is an exact copy of doc 0 -> identical fingerprint sets
    s0 = set(fp[fp.doc_id == 0].fingerprint)
    s100 = set(fp[fp.doc_id == 100].fingerprint)
    assert s0 and s0 == s100
    # fingerprints are a subset of the doc's shingle hashes
    sh0 = set(sh[sh.doc_id == 0].shingle)
    assert s0 <= sh0
    # winnowing selects far fewer than all shingles, more than none
    assert 0 < len(s0) < len(sh0)


def test_quantize_zero_vector_guard(spark):
    df = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [1.0, -2.0, 0.5, 4.0])],
        "vec_id long, embedding array<double>",
    )
    out = S.quantize_vectors(df, bits=8).toPandas().set_index("vec_id")
    assert list(out.loc[0, "qvec"]) == [0.0, 0.0, 0.0, 0.0]
    assert out.loc[1, "qvec"][3] == 127.0  # max component hits qmax
