"""Round-5 advisor fixes, each pinned by a regression test:

1. read_ept on a laszip dataset whose plan prunes to zero nodes
   returns an empty DataFrame with the right schema (the reference
   EptReader returns zero points; previously IndexError).
2. writers.copc with anisotropic scale declares a scale-consistent
   world-space root cube, so conforming readers (ours included)
   prune correctly on every axis.
3. Node pruning treats boundary contact (polygon edge collinear
   with a node-cube edge) as overlap, matching the reference's
   !disjoint semantics (CopcReader.cpp:773-787).
4. Planning reads size the header+VLR region from the header's
   point-data offset instead of a fixed 64 KiB head, so a COPC/LAS
   file with >64 KiB of VLRs still parses.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
import pytest

from pdal_spark.sources.copc import (
    _rect_intersects_polygon,
    copc_quickinfo,
    read_copc,
)
from pdal_spark.sources.copcwriter import write_copc
from pdal_spark.sources.ept import read_ept

_REF = "/root/reference/test/data"
_LS_EPT = f"{_REF}/ept/lone-star-laszip"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(_REF),
    reason="reference test data not present",
)


# ---- 1. fully-pruned laszip EPT plan -------------------------------

@needs_ref
def test_ept_fully_pruned_laszip_returns_empty(spark):
    # bounds far outside the lone-star extent: every node pruned
    df = read_ept(spark, _LS_EPT, bounds=(0.0, 0.0, 10.0, 10.0))
    assert df.count() == 0
    # schema still derived from the (root) node header
    assert {"X", "Y", "Z"} <= set(df.columns)


# ---- 2. anisotropic-scale COPC writer ------------------------------

def _aniso_pdf(n=20000, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "X": np.round(rng.uniform(500000, 500040, n), 2),
        "Y": np.round(rng.uniform(4910000, 4910040, n), 2),
        # Z on a finer grid to exercise the 0.001 scale
        "Z": np.round(rng.uniform(100, 110, n), 3),
        "Intensity": rng.integers(0, 3000, n).astype("int32"),
        "Classification": rng.integers(1, 20, n).astype("int16"),
        "GpsTime": np.arange(n, dtype="float64") * 1e-4 + 3e8,
    })


def test_copc_writer_anisotropic_scale(spark, tmp_path):
    pdf = _aniso_pdf()
    df = spark.createDataFrame(pdf).repartition(1)
    out = str(tmp_path / "aniso")
    assert write_copc(df, out, scale=(0.01, 0.01, 0.001)) == 1
    fp = [os.path.join(out, f) for f in os.listdir(out)
          if f.endswith(".laz")][0]

    # the declared root cube must contain the data on EVERY axis
    qi = copc_quickinfo(fp)
    ext = qi["root_extent"]
    assert ext[0] <= pdf.X.min() and ext[3] >= pdf.X.max()
    assert ext[1] <= pdf.Y.min() and ext[4] >= pdf.Y.max()
    assert ext[2] <= pdf.Z.min() and ext[5] >= pdf.Z.max()
    # and it must be a true cube in world units
    assert (ext[3] - ext[0]) == pytest.approx(ext[4] - ext[1])
    assert (ext[3] - ext[0]) == pytest.approx(ext[5] - ext[2])

    # bounds/resolution queries through the pruning reader must
    # agree with a plain pandas filter (no silently dropped or
    # phantom points from a mis-declared cube)
    assert read_copc(spark, fp).count() == len(pdf)
    b3 = (500010.0, 4910010.0, 102.0, 500030.0, 4910030.0, 106.0)
    want = pdf[(pdf.X >= b3[0]) & (pdf.X <= b3[3])
               & (pdf.Y >= b3[1]) & (pdf.Y <= b3[4])
               & (pdf.Z >= b3[2]) & (pdf.Z <= b3[5])]
    assert read_copc(spark, fp, bounds=b3).count() == len(want)


# ---- 3. collinear polygon edge counts as overlap -------------------

def test_polygon_edge_collinear_with_rect_edge_intersects():
    # polygon sits entirely left of the rect, its right edge
    # running exactly along the rect's left edge x=10, spanning
    # beyond the rect's y-range: no vertex in rect, no rect corner
    # in polygon, no proper crossing — boundary contact only
    ring = np.array([[0.0, -5.0], [10.0, -5.0], [10.0, 25.0],
                     [0.0, 25.0], [0.0, -5.0]])
    assert _rect_intersects_polygon((10.0, 0.0, 20.0, 20.0), [ring])
    # endpoint-touch: polygon corner touches the rect corner only
    ring2 = np.array([[5.0, 25.0], [10.0, 20.0], [5.0, 30.0],
                      [5.0, 25.0]])
    assert _rect_intersects_polygon((10.0, 0.0, 20.0, 20.0), [ring2])
    # a truly disjoint polygon still prunes
    ring3 = ring - np.array([0.5, 0.0])
    assert not _rect_intersects_polygon(
        (10.0, 0.0, 20.0, 20.0), [ring3])


# ---- 4. >64 KiB header+VLR block -----------------------------------

def _inject_big_vlr(raw: bytes, payload_len: int = 65000) -> bytes:
    """Insert a filler VLR right after the copc info VLR of a
    copc_bytes file and fix every absolute offset: point-data
    offset, vlr count, EVLR start, info-VLR hierarchy offset, the
    chunk-table-offset field, and the hierarchy page entries."""
    hdr_size = 375
    info_len = 54 + 160
    ins_at = hdr_size + info_len
    filler = struct.pack("<H16sHH32s", 0, b"test_filler", 9999,
                         payload_len, b"oversized vlr")
    filler += b"\x07" * payload_len
    L = len(filler)
    new = bytearray(raw[:ins_at] + filler + raw[ins_at:])

    point_off, vlr_count = struct.unpack_from("<II", new, 96)
    struct.pack_into("<II", new, 96, point_off + L, vlr_count + 1)
    (evlr_start,) = struct.unpack_from("<Q", new, 235)
    struct.pack_into("<Q", new, 235, evlr_start + L)
    hier_off_at = hdr_size + 54 + 40  # info payload: 5d then Q
    (hier_off,) = struct.unpack_from("<Q", new, hier_off_at)
    struct.pack_into("<Q", new, hier_off_at, hier_off + L)
    (hier_size,) = struct.unpack_from("<Q", new, hier_off_at + 8)
    (cto,) = struct.unpack_from("<q", new, point_off + L)
    struct.pack_into("<q", new, point_off + L, cto + L)
    base = hier_off + L
    for eo in range(0, int(hier_size), 32):
        (off_,) = struct.unpack_from("<Q", new, base + eo + 16)
        struct.pack_into("<Q", new, base + eo + 16, off_ + L)
    return bytes(new)


def test_oversized_vlr_block_still_parses(spark, tmp_path):
    pdf = _aniso_pdf(n=5000, seed=3)
    df = spark.createDataFrame(pdf).repartition(1)
    out = str(tmp_path / "plain")
    write_copc(df, out)
    fp = [os.path.join(out, f) for f in os.listdir(out)
          if f.endswith(".laz")][0]
    raw = open(fp, "rb").read()
    big = _inject_big_vlr(raw)
    # header + VLR block now exceeds the old fixed 64 KiB head
    assert struct.unpack_from("<I", big, 96)[0] > 65536
    fp2 = str(tmp_path / "big_vlrs.copc.laz")
    with open(fp2, "wb") as fh:
        fh.write(big)

    qi = copc_quickinfo(fp2)
    assert qi["point_count"] == len(pdf)
    assert read_copc(spark, fp2).count() == len(pdf)
