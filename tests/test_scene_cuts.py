"""scene_cuts: a planted content shift is detected exactly at the
boundary frame; uniform content yields no cuts; short payloads
produce one cut-less frame."""

from pdal_spark.operators.multimodal import (
    attach_binary,
    frame_histograms,
    scene_cuts,
)


def _docs(spark, texts):
    return attach_binary(spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ))


def test_planted_shift_detected_at_boundary(spark):
    # 3 frames of 'a' (97%8=1) then 3 frames of 'd' (100%8=4)
    # -> exactly one cut at the boundary frame
    assert ord("a") % 8 != ord("d") % 8
    text = "a" * 30 + "d" * 30
    out = {r.frame_idx: r for r in scene_cuts(
        _docs(spark, [text]), every=10, cut_pct=50, codec="fake").collect()}
    assert len(out) == 6
    assert out[0].is_cut is None and out[0].l1_diff is None
    cuts = [f for f, r in out.items() if r.is_cut]
    assert cuts == [3]
    assert out[3].l1_diff == 20  # full 10-byte swap both bins


def test_uniform_content_no_cuts(spark):
    out = scene_cuts(_docs(spark, ["x" * 100]), every=10,
                     cut_pct=10, codec="fake").collect()
    assert len(out) == 10
    assert all(r.is_cut is False for r in out if r.frame_idx > 0)


def test_short_payload_single_frame(spark):
    out = scene_cuts(_docs(spark, ["abc"]), every=100, codec="fake").collect()
    assert len(out) == 1
    assert out[0].frame_byte_len == 3 and out[0].is_cut is None


def test_histograms_count_all_covered_bytes(spark):
    h = frame_histograms(_docs(spark, ["abcdefgh" * 5]), codec="fake",
                         every=8).collect()
    # 40 bytes, 5 frames; each frame sees each of the 8 residues once
    assert len(h) == 5
    for r in h:
        assert sum(getattr(r, f"h{d}") for d in range(8)) == 8
