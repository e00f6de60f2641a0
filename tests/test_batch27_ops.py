"""Batch-27: near_dup_keep_best."""

import pytest

from pdal_spark.operators import dedup as ops_dedup


def test_keep_best_prefers_longer_copy(spark):
    long_txt = "alpha beta gamma delta epsilon zeta eta theta " * 4
    near = long_txt + "iota"
    df = spark.createDataFrame(
        [
            (1, long_txt, len(long_txt)),
            (2, near, len(near)),           # near-dup, LONGER
            (9, "completely different words entirely here now", 44),
        ],
        ["doc_id", "text", "n_chars"],
    )
    out = {r.doc_id: r for r in
           ops_dedup.near_dup_keep_best(
               df, "n_chars", jaccard_threshold=0.5
           ).collect()}
    # min-id would keep 1; quality keeps 2 (longer)
    assert out[1].survivor_id == 2 and not out[1].is_survivor
    assert out[2].is_survivor
    assert out[9].is_survivor and out[9].comp_size == 1
