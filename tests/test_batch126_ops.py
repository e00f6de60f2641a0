"""Invariant tests for batch 126: peaks, zero crossings, frame
energy."""

from __future__ import annotations

from pdal_spark.operators.multimodal import (
    find_peaks,
    frame_energy,
    zero_crossings,
)


def _stream(spark, vals):
    return spark.createDataFrame(
        [(0, i, v) for i, v in enumerate(vals)],
        "k long, o long, v long",
    )


def test_find_peaks_basic_and_plateau(spark):
    vals = [1, 5, 1, 0, 3, 3, 1, 0, 9]
    out = find_peaks(_stream(spark, vals), "k", "o", "v",
                     half_width=2).collect()
    picks = sorted(r["o"] for r in out)
    # peak at 1 (v=5); plateau 3,3 -> earliest index 4 (the 5 at
    # index 1 is outside its half-width-2 window); tail 9
    assert picks == [1, 4, 8]


def test_zero_crossings_count(spark):
    vals = [1, -1, 1, -1, 0, -1, 2]
    r = zero_crossings(_stream(spark, vals), "k", "o",
                       "v").collect()[0]
    # crossings: +- -+ +- then 0 carries '-' (no crossing),
    # -1 keeps '-', then -> +2 crosses: total 4
    assert r["n_crossings"] == 4
    assert abs(r["zcr"] - 4 / 6) < 1e-12


def test_frame_energy_exact(spark):
    vals = [3, -4] * 8  # 16 samples, frame 8 -> 2 frames
    out = sorted(frame_energy(_stream(spark, vals), "k", "o", "v",
                              frame=8).collect(),
                 key=lambda r: r["frame_idx"])
    assert len(out) == 2
    assert all(r["energy"] == 4 * (9 + 16) for r in out)
    assert abs(out[0]["rms"] - (100 / 8) ** 0.5) < 1e-12


def test_frame_energy_drops_partial(spark):
    out = frame_energy(_stream(spark, [1] * 10), "k", "o", "v",
                       frame=4).collect()
    assert len(out) == 2
