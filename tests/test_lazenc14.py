"""Layered LASzip ENCODER (compressor 3) validated by BYTE-IDENTITY:
decode each chunk of the reference's lazperf-written fixtures and
re-encode the same points — the output must equal the fixture's
chunk bytes bit-for-bit (the scheme is deterministic; any model,
coder, or context drift breaks this immediately). Same standard the
round-3 v2 encoder met against laszip output."""

from __future__ import annotations

import os
import struct

import pytest

import pdal_spark.sources.las as L
from pdal_spark.sources.lazdec import read_chunk_table
from pdal_spark.sources.lazdec14 import decompress_chunk14
from pdal_spark.sources.lazenc14 import compress_chunk14

_REF = "/root/reference/test/data"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(_REF),
    reason="reference test data not present",
)


def _roundtrip_chunks(path: str, limit: int):
    data = open(path, "rb").read()
    hdr = L._parse_las_header(data)
    chunks = read_chunk_table(
        data, hdr["off"], hdr["count"],
        hdr["laz"]["laszip_vlr"]["chunk_size"])
    (table_off,) = struct.unpack_from("<q", data, hdr["off"])
    for ci, (start, n_pts) in enumerate(chunks[:limit]):
        end = (chunks[ci + 1][0] if ci + 1 < len(chunks)
               else table_off)
        want = data[start:end]
        rec = decompress_chunk14(data, start, n_pts, hdr["fmt"],
                                 hdr["eb"], hdr["size"])
        got = compress_chunk14(rec, hdr["fmt"], hdr["eb"])
        assert got == want, f"chunk {ci} not byte-identical"


@needs_ref
def test_byte_identity_format7_rgb():
    """1.2-with-color.copc.laz: POINT14+RGB14, 65 variable-size
    octree-node chunks — all byte-identical on re-encode."""
    _roundtrip_chunks(f"{_REF}/copc/1.2-with-color.copc.laz", 99)


@needs_ref
def test_byte_identity_format6():
    _roundtrip_chunks(f"{_REF}/copc/lone-star.copc.laz", 3)


@needs_ref
def test_byte_identity_format8_extra_bytes():
    """POINT14+RGBNIR14+BYTE14(3), fixed 50k chunks."""
    _roundtrip_chunks(
        f"{_REF}/laz/las_with_several_extra_byte_bloc.laz", 2)
