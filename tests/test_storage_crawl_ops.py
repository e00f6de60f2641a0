"""Semantics pins for the storage/crawl batch: CDC shift-resistance
and coverage, redirect resolution vs a Python walk, n-gram novelty
ground truth, OOV curve monotonicity."""

import numpy as np
import pandas as pd
import pytest

from pdal_spark.operators.dedup import cdc_chunks
from pdal_spark.operators.graph import redirect_resolve
from pdal_spark.operators.textops import ngram_novelty, oov_curve


def _chunks(spark, texts, bits=6):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    return cdc_chunks(df, mask_bits=bits).toPandas()


def test_cdc_covers_text_exactly(spark):
    rng = np.random.RandomState(7)
    txt = "".join(chr(97 + c) for c in rng.randint(0, 26, 3000))
    out = _chunks(spark, [txt]).sort_values("chunk_idx")
    assert out["length"].sum() == len(txt)
    assert out["start"].iloc[0] == 0
    # chunks tile the text with no gaps
    nxt = (out["start"] + out["length"]).values[:-1]
    assert (nxt == out["start"].values[1:]).all()
    assert len(out) > 5  # boundaries actually fire at ~64 chars


def test_cdc_boundaries_shift_resistant(spark):
    """Inserting a prefix shifts early chunks but the boundary
    POSITIONS relative to content re-align after one window — the
    defining CDC property vs fixed-size chunking."""
    rng = np.random.RandomState(13)
    base = "".join(chr(97 + c) for c in rng.randint(0, 26, 4000))
    shifted = "XYZQW" + base
    a = _chunks(spark, [base]).sort_values("chunk_idx")
    b = _chunks(spark, [shifted]).sort_values("chunk_idx")
    # boundary end-positions in CONTENT coordinates
    ea = set((a["start"] + a["length"] - 1).tolist())
    eb = set((b["start"] + b["length"] - 1 - 5).tolist())
    later = {e for e in ea if e > 100}
    assert later, "need boundaries past the warm-up region"
    # all content boundaries past the first window re-align
    assert later <= eb


def test_cdc_empty_and_short_docs(spark):
    out = _chunks(spark, ["", "short text", "x" * 31])
    assert set(out["doc_id"]) == {1, 2}  # empty doc -> no chunks
    one = out[out["doc_id"] == 2]
    assert len(one) == 1 and one["length"].iloc[0] == 31


def test_redirect_resolve_vs_python_walk(spark):
    # chains into terminals + a 3-cycle + a self-loop + feeders
    edges = [(1, 2), (2, 3), (3, 100),          # chain -> terminal
             (10, 11), (11, 12), (12, 10),      # 3-cycle
             (20, 10),                          # feeder into cycle
             (30, 30),                          # self-loop
             (31, 30)]                          # feeder into loop
    df = spark.createDataFrame(edges, "src long, dst long")
    out = redirect_resolve(df, max_rounds=6).toPandas() \
        .set_index("url")
    assert out.loc[1, "terminal"] == 100 and out.loc[1, "hops"] == 3
    assert out.loc[2, "hops"] == 2
    assert out.loc[100, "hops"] == 0
    assert not out.loc[1, "is_cycle"]
    for u in (10, 11, 12, 20, 30, 31):
        assert out.loc[u, "is_cycle"], u
        assert out.loc[u, "hops"] == -1
        assert pd.isna(out.loc[u, "terminal"])


def test_redirect_long_chain_needs_log_rounds(spark):
    n = 200
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = redirect_resolve(df, max_rounds=8).toPandas() \
        .set_index("url")  # 2^8 = 256 >= 200
    assert out.loc[0, "terminal"] == n and out.loc[0, "hops"] == n
    assert not out["is_cycle"].any()


def test_ngram_novelty_ground_truth(spark):
    ref = spark.createDataFrame(
        [(0, "a b c d e")], "doc_id long, text string")
    sc = spark.createDataFrame(
        [(1, "a b c x y"),    # grams: abc(seen) bcx cxy -> 2 novel
         (2, "a b c d e")],   # all 3 grams seen
        "doc_id long, text string")
    out = ngram_novelty(sc, ref, n=3).toPandas() \
        .set_index("doc_id")
    assert out.loc[1, "n_grams"] == 3 and out.loc[1, "n_novel"] == 2
    assert out.loc[2, "n_grams"] == 3 and out.loc[2, "n_novel"] == 0


def test_oov_curve_monotone(spark):
    docs = spark.createDataFrame(
        [(i, "common " * 5 + f"rare{i} unique{i}")
         for i in range(50)], "doc_id long, text string")
    out = oov_curve(docs, [1, 10, 1000]).toPandas() \
        .sort_values("vocab_k")
    # bigger vocab -> fewer OOV tokens; k=1 keeps only "common"
    assert (out["n_oov"].values[:-1] >= out["n_oov"].values[1:]) \
        .all()
    n_total = out["n_tokens"].iloc[0]
    assert out[out["vocab_k"] == 1]["n_oov"].iloc[0] \
        == n_total - 250   # 50 docs x 5 "common" + trailing ''
    assert out[out["vocab_k"] == 1000]["n_oov"].iloc[0] == 0
