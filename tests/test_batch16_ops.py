"""Batch-16 ops: hashed_features, oov_rate, image_tile_manifest."""

import pyspark.sql.functions as F
import pytest

from pdal_spark.operators import multimodal as ops_mm
from pdal_spark.operators import textops as ops_text


def test_hashed_features_sparse_and_signed(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b"), (3, "")], ["doc_id", "text"]
    )
    out = ops_text.hashed_features(df, dim=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.idx] = r.val
    # same words -> same buckets; doc 1's 'a' magnitude is 3x doc 2's
    a_idx = {i for i, v in by_doc[1].items() if abs(v) == 3}
    assert len(a_idx) == 1
    ai = a_idx.pop()
    assert abs(by_doc[2][ai]) == 1
    assert by_doc[1][ai] == 3 * by_doc[2][ai]
    # indexes bounded
    assert all(0 <= r.idx < 16 for r in out)


def test_oov_rate_detects_unseen_tokens(spark):
    train = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    score = spark.createDataFrame(
        [(1, "a b c"), (2, "a x y z")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in
           ops_text.oov_rate(score, train).collect()}
    assert out[1].n_oov == 0 and out[1].oov_q == 0
    assert out[2].n_oov == 3
    assert out[2].oov_q == (3 * (1 << 20)) // 4


def test_image_tiles_cover_without_overflow(spark):
    meta = spark.createDataFrame(
        [(1, 100, 130, 70, 3)],
        "doc_id long, byte_len long, width int, height int,"
        " n_channels int",
    )
    out = ops_mm.image_tile_manifest(meta, patch=64).collect()
    # 130x70 with 64-stride: 3 x 2 tiles
    assert len(out) == 6
    for r in out:
        assert r.px + r.pw <= 130 and r.py + r.ph <= 70
        assert 1 <= r.pw <= 64 and 1 <= r.ph <= 64
    # full coverage: tile areas sum to the image area
    assert sum(r.pw * r.ph for r in out) == 130 * 70
