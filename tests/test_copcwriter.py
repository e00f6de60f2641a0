"""writers.copc analog: output must round-trip through our own
COPC reader (itself pinned against PDAL's CopcReaderTest values),
be readable as a plain layered .laz, honor the copc-info-VLR-first
spec rule, and exhibit real octree behavior (coarse-resolution
queries return the node samples, not everything)."""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
import pytest

from pdal_spark.sources.copc import (
    copc_hierarchy,
    copc_quickinfo,
    parse_copc_info,
    read_copc,
)
from pdal_spark.sources.copcwriter import build_octree, write_copc


def _pdf(n=60000, extent=40.0, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "X": np.round(rng.uniform(500000, 500000 + extent, n), 2),
        "Y": np.round(rng.uniform(4910000, 4910000 + extent, n), 2),
        "Z": np.round(rng.uniform(100, 100 + extent / 4, n), 2),
        "Intensity": rng.integers(0, 3000, n).astype("int32"),
        "ReturnNumber": rng.integers(1, 5, n).astype("int16"),
        "NumberOfReturns": np.full(n, 5, dtype="int16"),
        "Classification": rng.integers(1, 20, n).astype("int16"),
        "GpsTime": np.arange(n, dtype="float64") * 1e-4 + 3e8,
        "Red": rng.integers(0, 65535, n).astype("int32"),
        "Green": rng.integers(0, 65535, n).astype("int32"),
        "Blue": rng.integers(0, 65535, n).astype("int32"),
        "ScanChannel": rng.integers(0, 4, n).astype("int16"),
    })


@pytest.fixture(scope="module")
def copc_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("copcw") / "tiles")
    pdf = _pdf()
    df = spark.createDataFrame(pdf).repartition(2)
    nf = write_copc(df, out, capacity=8000)
    assert nf == 2
    return out, pdf


def test_roundtrip_multiset(spark, copc_dir):
    out, pdf = copc_dir
    back = read_copc(spark, out).toPandas()
    assert len(back) == len(pdf)
    cols = list(pdf.columns)
    a = pdf.sort_values(cols).reset_index(drop=True)
    b = back[cols].copy()
    for c in ("X", "Y", "Z"):
        b[c] = b[c].round(2)  # int-grid quantization ulp
    b = b.sort_values(cols).reset_index(drop=True)
    for c in cols:
        if c == "GpsTime":
            assert np.allclose(a[c], b[c], rtol=0, atol=0), c
        else:
            assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_header_spec_rules(copc_dir):
    out, pdf = copc_dir
    f = sorted(os.listdir(out))[0]
    data = open(os.path.join(out, f), "rb").read()
    # copc info VLR must be the FIRST VLR, right after the header
    (hdr_size,) = struct.unpack_from("<H", data, 94)
    user_id = data[hdr_size + 2:hdr_size + 18].rstrip(b"\x00")
    (record_id,) = struct.unpack_from("<H", data, hdr_size + 18)
    assert user_id == b"copc" and record_id == 1
    info = parse_copc_info(data)
    assert info["header"]["fmt"] == 7
    assert info["spacing"] > 0
    qi = copc_quickinfo(os.path.join(out, f))
    assert qi["point_count"] > 0


def test_bounds_query_matches_filter(spark, copc_dir):
    out, pdf = copc_dir
    b = (500010, 4910010, 500030, 4910030)
    got = read_copc(spark, out, bounds=b).count()
    want = int(((pdf.X >= b[0]) & (pdf.X <= b[2])
                & (pdf.Y >= b[1]) & (pdf.Y <= b[3])).sum())
    assert got == want


def test_resolution_query_prunes(spark, copc_dir):
    out, pdf = copc_dir
    full = read_copc(spark, out).count()
    qi = copc_quickinfo(os.path.join(out,
                                     sorted(os.listdir(out))[0]))
    coarse = read_copc(spark, out,
                       resolution=qi["spacing"] * 2).count()
    assert 0 < coarse < full  # only node samples at depth 0


def test_hierarchy_prunes_subtrees(copc_dir):
    out, pdf = copc_dir
    f = os.path.join(out, sorted(os.listdir(out))[0])
    head = open(f, "rb").read(65536)
    info = parse_copc_info(head)
    with open(f, "rb") as fh:
        full = copc_hierarchy(fh, info)
        assert len(full["nodes"]) > 1  # real octree, not one blob
        ext = info["root_extent"]
        w = ext[3] - ext[0]
        # strictly inside the low corner (no midpoint touching —
        # cube children that merely abut the box still overlap it)
        corner = (ext[0] + w * 0.01, ext[1] + w * 0.01,
                  ext[0] + w * 0.3, ext[1] + w * 0.3)
        b = copc_hierarchy(fh, info, bounds=corner)
        assert len(b["nodes"]) < len(full["nodes"])


def test_read_as_plain_laz(spark, copc_dir):
    from pdal_spark.sources.las import read_las, read_las_chunked

    out, pdf = copc_dir
    assert read_las(spark, out).count() == len(pdf)
    assert read_las_chunked(spark, out + "/*.laz").count() == len(pdf)


def test_octree_sampling_invariants():
    """Every point lands in exactly one node; node samples respect
    the per-voxel-one-point rule."""
    rng = np.random.default_rng(9)
    n = 50000
    x = rng.integers(0, 4000, n).astype(np.int64)
    y = rng.integers(0, 4000, n).astype(np.int64)
    z = rng.integers(0, 1000, n).astype(np.int64)
    nodes, mn, size = build_octree(
        x.astype("f8"), y.astype("f8"), z.astype("f8"),
        capacity=5000)
    all_idx = np.concatenate([idx for _, idx in nodes])
    assert len(all_idx) == n
    assert len(np.unique(all_idx)) == n
    depths = sorted({k[0] for k, _ in nodes})
    assert depths[0] == 0 and len(depths) > 1


def test_write_las_laz_format8(spark, tmp_path):
    """write_las(laz=True) now covers formats 6-8 via the layered
    encoder (fixed 50k chunks) — full-fidelity round trip."""
    import numpy as np
    import pandas as pd

    from pdal_spark.sources.las import read_las, write_las

    rng = np.random.default_rng(2)
    n = 20000
    pdf = pd.DataFrame({
        "X": np.round(rng.uniform(0, 100, n), 2),
        "Y": np.round(rng.uniform(0, 100, n), 2),
        "Z": np.round(rng.uniform(0, 30, n), 2),
        "Intensity": rng.integers(0, 5000, n).astype("int32"),
        "Classification": rng.integers(1, 30, n).astype("int16"),
        "GpsTime": np.arange(n) * 1e-3 + 4e8,
        "ScanChannel": rng.integers(0, 4, n).astype("int16"),
        "Infrared": rng.integers(0, 60000, n).astype("int32"),
        "Red": rng.integers(0, 60000, n).astype("int32"),
        "Green": rng.integers(0, 60000, n).astype("int32"),
        "Blue": rng.integers(0, 60000, n).astype("int32"),
    })
    out = str(tmp_path / "laz14")
    df = spark.createDataFrame(pdf).repartition(2)
    assert write_las(df, out, laz=True) == 2  # infers format 8
    back = read_las(spark, out).toPandas()
    cols = list(pdf.columns)
    a = pdf.sort_values(cols).reset_index(drop=True)
    b = back[cols].copy()
    for c in ("X", "Y", "Z"):
        b[c] = b[c].round(2)
    b = b.sort_values(cols).reset_index(drop=True)
    for c in cols:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
