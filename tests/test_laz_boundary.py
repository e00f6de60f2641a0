"""LAZ ADR boundary tests: laszip-VLR introspection, loud per-file
diagnostics, and the register_laz_decoder swap-in point (VERDICT r2
#8 — the codec itself stays out, see the ADR in sources/las.py)."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from pdal_spark.sources import las as L


def _tiny_las_bytes():
    pdf = pd.DataFrame({
        "X": [1.0, 2.0, 3.0], "Y": [4.0, 5.0, 6.0],
        "Z": [7.0, 8.0, 9.0],
    })
    return L._pack_las(pdf, 0, (0.01, 0.01, 0.01), (0.0, 0.0, 0.0), 2)


def _laszip_vlr_payload(chunk_size=50000):
    # compressor=2 (pointwise chunked), coder=0 (arithmetic),
    # version 2.2r0, options 0, chunk size, no special evlrs,
    # one POINT10 v2 item
    return struct.pack(
        "<HHBBHIIqqH" + "HHH",
        2, 0, 2, 2, 0, 0, chunk_size, 0, -1, 1,
        6, 20, 2,
    )


def _as_laz(raw: bytes, chunk_size=50000) -> bytes:
    """Convert an uncompressed .las byte stream into a structurally
    valid .laz SHELL: laszip VLR + compression bit + chunk-table
    offset. (Point payload stays raw — only header/stream layout is
    exercised; a real codec would follow the chunk table.)"""
    (hdr_size,) = struct.unpack_from("<H", raw, 94)
    (point_off, vlr_count) = struct.unpack_from("<II", raw, 96)
    payload = _laszip_vlr_payload(chunk_size)
    vlr = struct.pack("<H16sHH32s", 0, b"laszip encoded", 22204,
                      len(payload), b"by test") + payload
    out = bytearray(raw[:hdr_size])
    out[104] |= 0x80
    new_off = hdr_size + len(vlr) + 8  # +8: chunk table offset slot
    struct.pack_into("<II", out, 96, new_off, vlr_count + 1)
    body = raw[point_off:]
    chunk_table_off = new_off + len(body)
    return bytes(out) + vlr + struct.pack("<q", chunk_table_off) + body


def test_laz_info_reads_stream_layout():
    laz = _as_laz(_tiny_las_bytes(), chunk_size=1234)
    info = L.laz_info(laz)
    assert info["compressed_bit"] is True
    assert info["base_format"] == 0
    assert info["point_count"] == 3
    v = info["laszip_vlr"]
    assert v["compressor"] == "pointwise_chunked"
    assert v["coder"] == "arithmetic"
    assert v["version"] == "2.2r0"
    assert v["chunk_size"] == 1234
    assert v["items"] == [{"type": "POINT10", "size": 20,
                           "version": 2}]
    assert info["n_chunks"] == 1
    assert info["chunk_table_offset"] > 0


def test_laz_error_carries_diagnostics(tmp_path):
    """With NO decoder registered the header parse raises and the
    message names the stream contents (the r3 pure-Python decoder is
    normally auto-registered; unregister to test the bare path)."""
    default = L._LAZ_DECODER
    L.register_laz_decoder(None)
    try:
        laz = _as_laz(_tiny_las_bytes())
        with pytest.raises(ValueError) as ei:
            L._parse_las_header(laz)
        msg = str(ei.value)
        assert "LAZ" in msg
        assert "pointwise_chunked" in msg
        assert "POINT10" in msg
        assert "register_laz_decoder" in msg
    finally:
        L.register_laz_decoder(default)


def test_registered_decoder_dispatches(spark, tmp_path):
    laz = _as_laz(_tiny_las_bytes())
    p = tmp_path / "shell.laz"
    p.write_bytes(laz)

    def fake_decoder(data: bytes, hdr: dict) -> pd.DataFrame:
        assert hdr["laz"]["laszip_vlr"]["chunk_size"] == 50000
        n = hdr["count"]
        cols = [c for c, _ in L._dims(hdr["fmt"])]
        out = pd.DataFrame({c: np.zeros(n) for c in cols})
        out["X"] = np.arange(n, dtype="f8")
        return out

    default = L._LAZ_DECODER
    L.register_laz_decoder(fake_decoder)
    try:
        got = L.read_las(spark, str(p)).toPandas()
        assert len(got) == 3
        assert sorted(got["X"]) == [0.0, 1.0, 2.0]
    finally:
        L.register_laz_decoder(default)


def test_plain_las_still_reads(spark, tmp_path):
    p = tmp_path / "plain.las"
    p.write_bytes(_tiny_las_bytes())
    got = L.read_las(spark, str(p)).toPandas()
    assert len(got) == 3
    assert sorted(got["X"]) == [1.0, 2.0, 3.0]
