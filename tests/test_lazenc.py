"""LASzip ENCODER validation: byte-identity against the reference's
own laszip-produced fixtures (the strongest possible check — the
compressed body must equal what the canonical laszip tool wrote),
plus encode->decode round trips through the independently validated
decoder, plus the Spark write_las(laz=True) -> read_las path."""

from __future__ import annotations

import os
import struct

import pytest

import pdal_spark.sources.las as L
from pdal_spark.sources.lazenc import compress_las_bytes

_REF = "/root/reference/test/data"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(_REF),
    reason="reference test data not present",
)


def _body(d: bytes) -> bytes:
    (po,) = struct.unpack_from("<I", d, 96)
    return d[po:]


@needs_ref
def test_encoder_body_byte_identical_to_laszip_basefile():
    """Compressing basefile.las reproduces laszip-generated.laz's
    compressed body (chunk-offset slot + chunks + chunk table)
    BYTE FOR BYTE."""
    las = open(f"{_REF}/laszip/basefile.las", "rb").read()
    ref = open(f"{_REF}/laszip/laszip-generated.laz", "rb").read()
    assert _body(compress_las_bytes(las)) == _body(ref)


@needs_ref
def test_encoder_body_byte_identical_to_laszip_autzen():
    """110k points / 3 chunks: byte-identical to the reference's
    autzen_trim.laz body (601,209 bytes of arithmetic-coded
    stream + chunk table)."""
    las = open(f"{_REF}/las/autzen_trim.las", "rb").read()
    ref = open(f"{_REF}/laz/autzen_trim.laz", "rb").read()
    mine = compress_las_bytes(las)
    assert len(_body(mine)) == len(_body(ref))
    assert _body(mine) == _body(ref)


@needs_ref
def test_encode_decode_roundtrip_exact():
    las = open(f"{_REF}/laszip/basefile.las", "rb").read()
    laz = compress_las_bytes(las)
    df_laz = L._decode_las(laz, L._parse_las_header(laz))
    df_las = L._decode_las(las, L._parse_las_header(las))
    for c in df_las.columns:
        assert (df_las[c].to_numpy() == df_laz[c].to_numpy()).all(), c


def test_write_las_laz_roundtrip_spark(spark, tmp_path):
    """writers.las laz=True: per-partition .laz files that read_las
    decodes back exactly (synthetic data — no reference needed)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    n = 500
    pdf = pd.DataFrame({
        "X": np.round(rng.uniform(-100, 100, n), 2),
        "Y": np.round(rng.uniform(-50, 50, n), 2),
        "Z": np.round(rng.uniform(0, 30, n), 2),
        "Intensity": rng.randint(0, 4096, n).astype("int32"),
        "GpsTime": np.round(rng.uniform(0, 1e5, n), 6),
        "Red": rng.randint(0, 65536, n).astype("int32"),
        "Green": rng.randint(0, 65536, n).astype("int32"),
        "Blue": rng.randint(0, 65536, n).astype("int32"),
    })
    df = spark.createDataFrame(pdf)
    out_laz = tmp_path / "lazout"
    out_las = tmp_path / "lasout"
    n_files = L.write_las(df.repartition(3), str(out_laz), laz=True)
    assert n_files >= 1
    assert all(p.suffix == ".laz" for p in out_laz.iterdir())
    L.write_las(df.repartition(3), str(out_las))
    # contract: the .laz read-back equals the .las read-back EXACTLY
    # (both share the writer's 0.01-grid quantization)
    key = ["X", "Y", "Z", "GpsTime"]
    got = (L.read_las(spark, str(out_laz)).toPandas()
           .sort_values(key).reset_index(drop=True))
    want = (L.read_las(spark, str(out_las)).toPandas()
            .sort_values(key).reset_index(drop=True))
    assert len(got) == n and len(want) == n
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_laz_smaller_than_las(spark, tmp_path):
    import numpy as np
    import pandas as pd

    n = 2000
    t = np.arange(n)
    pdf = pd.DataFrame({
        "X": np.round(t * 0.05, 2), "Y": np.round(t * 0.03, 2),
        "Z": np.full(n, 12.5),
    })
    las = L._pack_las(pdf, 0, (0.01, 0.01, 0.01), (0, 0, 0), 2)
    laz = compress_las_bytes(las)
    assert len(laz) < len(las) // 2


def test_format_6_rejected(spark):
    import pandas as pd

    pdf = pd.DataFrame({"X": [1.0], "Y": [2.0], "Z": [3.0]})
    las = L._pack_las(pdf, 6, (0.01, 0.01, 0.01), (0, 0, 0), 4)
    with pytest.raises(ValueError, match="layered"):
        compress_las_bytes(las)


@needs_ref
def test_extra_bytes_stream_roundtrip():
    """BYTE v2 path: widen basefile's records with 2 synthetic extra
    bytes per point, encode, decode — the point fields must survive
    exactly (the EB sub-stream advances the shared arithmetic state,
    so any EB codec error corrupts every later field)."""
    import numpy as np

    las = open(f"{_REF}/laszip/basefile.las", "rb").read()
    hdr = L._parse_las_header(las)
    n, size = hdr["count"], hdr["size"]
    rec = np.frombuffer(las, dtype="u1", count=n * size,
                        offset=hdr["off"]).reshape(n, size)
    eb = np.stack([np.arange(n) % 251, (np.arange(n) * 7) % 253],
                  axis=1).astype("u1")
    widened = np.concatenate([rec, eb], axis=1)
    head = bytearray(las[:hdr["off"]])
    struct.pack_into("<H", head, 105, size + 2)
    las_eb = bytes(head) + widened.tobytes()
    laz = compress_las_bytes(las_eb)
    info = L.laz_info(laz)
    assert info["laszip_vlr"]["items"][-1] == {
        "type": "BYTE", "size": 2, "version": 2}
    df_laz = L._decode_las(laz, L._parse_las_header(laz))
    df_las = L._decode_las(las_eb, L._parse_las_header(las_eb))
    for c in df_las.columns:
        assert (df_las[c].to_numpy() == df_laz[c].to_numpy()).all(), c
