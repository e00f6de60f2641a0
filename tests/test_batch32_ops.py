"""Training-pair mining batch: bitext_margin_topk (hub-penalizing
margin), negative_sample (consistent hash negatives), unigram_kl
(smoothed corpus drift)."""

import math

from pdal_spark.operators.sampling import negative_sample
from pdal_spark.operators.similarity import bitext_margin_topk
from pdal_spark.operators.textops import KL_Q, unigram_kl


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_bitext_margin_penalizes_hubs(spark):
    # src 0 truly matches tgt 1 (identical direction). tgt 3 is a
    # HUB: moderately similar to every src. Raw cosine would rank
    # the true pair first for src 0 but margin must additionally
    # DEMOTE hub pairs for src 2 (whose best cosine IS the hub).
    h = 1.0 / math.sqrt(2.0)
    src = _emb(spark, [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 0),
    ])
    tgt = _emb(spark, [
        (1, [0.99, 0.1, 0.0, 0.0], 1),   # true pair of 0
        (3, [h, h, 0.0, 0.0], 1),        # hub
        (5, [0.0, 0.0, 1.0, 0.0], 1),    # unrelated
    ])
    out = bitext_margin_topk(src, tgt, k=2)
    rows = {(r.src_id, r.tgt_id): r for r in out.collect()}
    # forward pairs exist with ranks
    assert rows[(0, 1)].sim_rank == 1
    # margin of the true pair exceeds the hub pair for src 0, and
    # straddles 1.0 (above-neighborhood vs below-neighborhood)
    assert rows[(0, 1)].margin > 1.0 > rows[(0, 3)].margin
    # the true pair also beats the hub's best pairing globally even
    # though both cosines are "high"
    assert rows[(0, 1)].margin > rows[(2, 3)].margin
    for r in rows.values():
        assert r.margin == r.margin  # not NaN


def test_negative_sample_excludes_same_label_and_is_stable(spark):
    anchors = _emb(spark, [
        (1, [0.0], 0), (2, [0.0], 1),
    ]).select("vec_id", "label")
    pool = _emb(spark, [
        (10, [0.0], 0), (11, [0.0], 1), (12, [0.0], 1),
        (13, [0.0], 0), (14, [0.0], 1), (15, [0.0], 0),
    ]).select("vec_id", "label")
    out = negative_sample(anchors, pool, k=2).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r.anchor_id, []).append(
            (r.neg_rank, r.neg_id)
        )
    # anchor 1 (label 0) only draws label-1 negatives
    assert {n for _, n in by_anchor[1]} <= {11, 12, 14}
    assert {n for _, n in by_anchor[2]} <= {10, 13, 15}
    assert len(by_anchor[1]) == 2 and len(by_anchor[2]) == 2
    # determinism: same result after repartitioning both inputs
    out2 = negative_sample(
        anchors.repartition(7), pool.repartition(3), k=2
    ).collect()
    assert sorted((r.anchor_id, r.neg_rank, r.neg_id)
                  for r in out) == sorted(
        (r.anchor_id, r.neg_rank, r.neg_id) for r in out2
    )


def test_unigram_kl_zero_on_identical_and_positive_on_shifted(spark):
    a = spark.createDataFrame(
        [(1, "x y z x"), (2, "y z q")], "doc_id long, text string"
    )
    same = unigram_kl(a, a)
    assert same.agg({"contrib_q": "sum"}).collect()[0][0] == 0
    # shifted corpus: KL > 0 (Gibbs), quantization error << signal
    b = spark.createDataFrame(
        [(1, "q q q q"), (2, "q r r r")], "doc_id long, text string"
    )
    tot = unigram_kl(a, b).agg({"contrib_q": "sum"}).collect()[0][0]
    assert tot > 0
    # nats recoverable: KL = tot / KL_Q / (N_a + V)
    kl = tot / KL_Q / (7 + 6)
    assert 0.0 < kl < 5.0
