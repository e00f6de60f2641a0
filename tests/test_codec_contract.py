"""VERDICT r2 #10: the deterministic fake codec is OPT-IN. The
default (codec=None) must raise loudly in this environment — a
production path can never silently decode fake pixels."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdal_spark.operators import multimodal as mm


def _docs(spark):
    return mm.attach_binary(spark.createDataFrame(
        [(1, "hello world")], "doc_id long, text string"
    ))


@pytest.mark.parametrize("fn", [
    lambda df: mm.decode_image_meta(df),
    lambda df: mm.resize_nearest(df, 4, 4),
    lambda df: mm.image_ahash(df),
    lambda df: mm.image_dhash(df),
    lambda df: mm.extract_features(df),
    lambda df: mm.sample_frames(df),
    lambda df: mm.decode_audio_meta(df),
    lambda df: mm.frame_histograms(df),
    lambda df: mm.scene_cuts(df),
])
def test_default_codec_raises_without_real_codec(spark, fn):
    with pytest.raises(RuntimeError, match="fake"):
        fn(_docs(spark))


def test_unknown_codec_rejected(spark):
    with pytest.raises(ValueError, match="unknown codec"):
        mm.decode_image_meta(_docs(spark), codec="libvips")


def test_registered_real_codec_becomes_default(spark):
    """The deployment path: register a real codec and codec=None
    resolves to it (no opt-in required)."""
    def batch(payload):
        lens = payload.map(len).astype("int64")
        return pd.DataFrame({
            "byte_len": lens,
            "width": np.full(len(lens), 2, dtype="int32"),
            "height": np.full(len(lens), 2, dtype="int32"),
            "n_channels": np.full(len(lens), 3, dtype="int32"),
        })

    def pixels(b, w, h, c=3):
        return np.zeros((h, w, c), dtype=np.uint8)

    try:
        mm.register_codec("testreal", batch, pixels, real=True)
        out = mm.decode_image_meta(_docs(spark)).collect()
        assert out[0]["width"] == 2
    finally:
        mm._CODECS.pop("testreal", None)
        mm._REAL_CODECS.remove("testreal")


def test_fake_codec_still_available_explicitly(spark):
    out = mm.decode_image_meta(_docs(spark), codec="fake").collect()
    assert out[0]["byte_len"] == 11
