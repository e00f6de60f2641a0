"""Optional native (C) decode kernels, compiled on first use.

The pure-Python codecs in `sources.lazdec` / `sources.lazdec14` are
the always-available reference implementation; this package holds
C ports of their hot loops, compiled at first use with the system C
compiler (`cc -O2 -shared -fPIC`) and loaded via ctypes.  The .so is
cached next to the source, keyed by a hash of the source text, and
written with an atomic rename so concurrent Spark worker processes
can race the build safely.

Everything degrades gracefully: no compiler, a failed build, or
`PDAL_SPARK_NO_NATIVE=1` simply leaves the Python path in place.
Equivalence is pinned by tests that decode the same chunks through
both implementations and compare byte-for-byte
(tests/test_native_lazdec14.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))

_lib14 = None
_lib14_tried = False
_lib10 = None
_lib10_tried = False


def _build(src_name: str, tag: str):
    """Compile one C source to a cached .so; return a CDLL or None.
    Zip-safe: under ``spark-submit --py-files pdal_spark.zip`` the
    source is read through importlib.resources and the .so cache
    lands in a per-user temp dir instead of the (virtual) package
    dir. Any failure -> None -> pure-Python fallback."""
    try:
        src = os.path.join(_DIR, src_name)
        if os.path.isfile(src):
            with open(src, "rb") as fh:
                text = fh.read()
            build_dir = _DIR if os.access(_DIR, os.W_OK) else None
        else:
            from importlib import resources

            text = (resources.files(__package__) / src_name) \
                .read_bytes()
            src = None
            build_dir = None
        if build_dir is None:
            build_dir = os.path.join(
                tempfile.gettempdir(),
                f"pdal_spark_native_{os.getuid()}")
            os.makedirs(build_dir, exist_ok=True)
        h = hashlib.sha256(text).hexdigest()[:16]
        so = os.path.join(build_dir, f"_{tag}_{h}.so")
        if not os.path.exists(so):
            if src is None:
                src = os.path.join(build_dir, f"_{tag}_{h}.c")
                with open(src, "wb") as fh:
                    fh.write(text)
            cc = os.environ.get("CC", "cc")
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=build_dir)
            os.close(fd)
            try:
                subprocess.run(
                    [cc, "-O2", "-shared", "-fPIC", "-o", tmp, src],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, so)  # atomic: racing workers OK
            except Exception:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                return None
        return ctypes.CDLL(so)
    except Exception:
        return None


def lazdec14_native():
    """The layered-chunk decode entry, or None if unavailable.

    Returns a callable ``decode(data, start, n_pts, fmt, eb,
    point_size) -> bytes`` producing n_pts packed on-disk PDRF 6-8
    records, or None when native decode is disabled/unbuildable.
    """
    global _lib14, _lib14_tried
    if os.environ.get("PDAL_SPARK_NO_NATIVE"):
        return None
    if _lib14_tried:
        return _lib14
    _lib14_tried = True
    lib = _build("lazdec14.c", "lazdec14")
    if lib is None:
        _lib14 = None
        return None
    fn = lib.pslaz_decode_chunk14
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
    ]

    def decode(data: bytes, start: int, n_pts: int, fmt: int,
               eb: int, point_size: int, out) -> None:
        """Decode into `out`, a writable C-contiguous uint8 numpy
        array of n_pts*point_size bytes (zero-copy)."""
        err = ctypes.create_string_buffer(256)
        rc = fn(data, len(data), start, n_pts, fmt, eb, point_size,
                out.ctypes.data_as(ctypes.c_char_p), err, 256)
        if rc != 0:
            raise ValueError(
                err.value.decode("ascii", "replace")
                or f"native lazdec14: error {rc}")

    _lib14 = decode
    return _lib14


def lazdec10_native():
    """Compressor-2 (pointwise v2) chunk decode entry, or None.

    Same contract as lazdec14_native: ``decode(data, start, n_pts,
    fmt, eb, point_size, out)`` filling a writable uint8 numpy
    buffer with packed PDRF 0-3 records.
    """
    global _lib10, _lib10_tried
    if os.environ.get("PDAL_SPARK_NO_NATIVE"):
        return None
    if _lib10_tried:
        return _lib10
    _lib10_tried = True
    lib = _build("lazdec14.c", "lazdec14")
    if lib is None:
        _lib10 = None
        return None
    fn = lib.pslaz_decode_chunk10
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
    ]

    def decode(data: bytes, start: int, n_pts: int, fmt: int,
               eb: int, point_size: int, out) -> None:
        err = ctypes.create_string_buffer(256)
        rc = fn(data, len(data), start, n_pts, fmt, eb, point_size,
                out.ctypes.data_as(ctypes.c_char_p), err, 256)
        if rc != 0:
            raise ValueError(
                err.value.decode("ascii", "replace")
                or f"native lazdec10: error {rc}")

    _lib10 = decode
    return _lib10


_enc14 = None
_enc14_tried = False


def lazenc14_native():
    """Layered (compressor 3) chunk ENCODE entry, or None.

    ``encode(recs_bytes, n_pts, fmt, eb, point_size) -> bytes``
    producing one complete layered chunk (raw first point + count +
    layer sizes + layers), byte-identical to the Python encoder.
    """
    global _enc14, _enc14_tried
    if os.environ.get("PDAL_SPARK_NO_NATIVE"):
        return None
    if _enc14_tried:
        return _enc14
    _enc14_tried = True
    lib = _build("lazdec14.c", "lazdec14")
    if lib is None:
        _enc14 = None
        return None
    fn = lib.pslaz_encode_chunk14
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p, ctypes.c_int,
    ]

    def encode(recs: bytes, n_pts: int, fmt: int, eb: int,
               point_size: int) -> bytes:
        cap = n_pts * point_size * 2 + 65536
        out = ctypes.create_string_buffer(cap)
        out_len = ctypes.c_int64(0)
        err = ctypes.create_string_buffer(256)
        rc = fn(recs, n_pts, fmt, eb, point_size, out, cap,
                ctypes.byref(out_len), err, 256)
        if rc != 0:
            raise ValueError(
                err.value.decode("ascii", "replace")
                or f"native lazenc14: error {rc}")
        return out.raw[:out_len.value]

    _enc14 = encode
    return _enc14


_enc10 = None
_enc10_tried = False


def lazenc10_native():
    """Compressor-2 (pointwise v2) chunk ENCODE entry, or None.

    ``encode(recs_bytes, n_pts, fmt, eb, point_size) -> bytes``:
    one complete pointwise chunk (raw first point + arithmetic
    stream), byte-identical to the Python encoder.
    """
    global _enc10, _enc10_tried
    if os.environ.get("PDAL_SPARK_NO_NATIVE"):
        return None
    if _enc10_tried:
        return _enc10
    _enc10_tried = True
    lib = _build("lazdec14.c", "lazdec14")
    if lib is None:
        _enc10 = None
        return None
    fn = lib.pslaz_encode_chunk10
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p, ctypes.c_int,
    ]

    def encode(recs: bytes, n_pts: int, fmt: int, eb: int,
               point_size: int) -> bytes:
        cap = n_pts * point_size * 2 + 65536
        out = ctypes.create_string_buffer(cap)
        out_len = ctypes.c_int64(0)
        err = ctypes.create_string_buffer(256)
        rc = fn(recs, n_pts, fmt, eb, point_size, out, cap,
                ctypes.byref(out_len), err, 256)
        if rc != 0:
            raise ValueError(
                err.value.decode("ascii", "replace")
                or f"native lazenc10: error {rc}")
        return out.raw[:out_len.value]

    _enc10 = encode
    return _enc10
