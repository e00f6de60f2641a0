"""Pure-Python LASzip *layered* (compressor 3) encoder — LAS 1.4
point formats 6-8, item codecs POINT14 / RGB14 / RGBNIR14 / BYTE14
version 3: the chunk format every modern .laz and every COPC file
carries. Mirror of `sources.lazdec14`, sharing the arithmetic
models and reusing `sources.lazenc`'s FastAC encoder + integer
corrector.

Reference behavior: vendor/lazperf/detail/field_point14.cpp:96-528
(compressor + encodeGpsTime), field_rgb14.cpp:68-170,
field_nir14.cpp:38-105, field_byte14.cpp:48-120, lazperf.cpp:146-268
(per-chunk layer framing: raw first point fields, u32 point count,
per-layer sizes, per-layer bytes) — behavior, not code: this module
is an independent Python implementation.

Validation is BYTE-IDENTITY: tests decode each chunk of the
reference's lazperf-written COPC fixtures and re-encode the exact
same points — the compressed layer bytes must match the fixture's
chunk bytes bit-for-bit (the scheme is fully deterministic), the
same standard the round-3 v2 encoder met against laszip output.
"""

from __future__ import annotations

import struct

import numpy as np

from pdal_spark.sources.lazdec import _SymModel, _i32
from pdal_spark.sources.lazdec14 import (
    _GPS_MULTI,
    _GPS_MULTI_CODE_FULL,
    _GPS_MULTI_MINUS,
    _LEVEL8,
    _MAP6,
    _U32,
    _U64,
    _Ctx14,
    _clamp_u8,
    _div2t,
    _i16,
    _i64,
    _lazy,
)
from pdal_spark.sources.lazenc import _Encoder, _IntCompressor


class _Layer:
    """One per-field arithmetic stream with lazperf's valid flag:
    encoding always runs (models update) but the bytes ship only
    once makeValid() was called (encoder.hpp:131-132, 320-328)."""

    __slots__ = ("enc", "valid")

    def __init__(self, valid: bool = False):
        self.enc = _Encoder()
        self.valid = valid

    def make_valid(self):
        self.valid = True

    def finish(self) -> bytes:
        data = self.enc.done()
        return data if self.valid else b""


class _CtxC14(_Ctx14):
    """Compressor-side channel context: same state layout, integer
    COMPRESSORS in place of the decompressors."""

    def _make_codecs(self):
        self.dx = _IntCompressor(32, 2)
        self.dy = _IntCompressor(32, 22)
        self.z = _IntCompressor(32, 20)
        self.intensity = _IntCompressor(16, 4)
        self.scan_angle = _IntCompressor(16, 2)
        self.psid = _IntCompressor(16, 1)
        self.gpstime = _IntCompressor(32, 9)


class _Point14C:
    """Point14Compressor (field_point14.cpp:96-400)."""

    def __init__(self):
        self.xy = _Layer(True)
        self.z = _Layer(True)
        self.cls = _Layer()
        self.flags = _Layer()
        self.inten = _Layer()
        self.sa = _Layer()
        self.ud = _Layer()
        self.psid = _Layer()
        self.gps = _Layer()
        self.ctxs = [_CtxC14() for _ in range(4)]
        self.last_channel = -1

    def layers(self):
        return [self.xy, self.z, self.cls, self.flags, self.inten,
                self.sa, self.ud, self.psid, self.gps]

    def first(self, pt: dict) -> int:
        sc = pt["sc"]
        c = self.ctxs[sc]
        c.have_last = True
        c.last_x, c.last_y, c.last_z_val = pt["x"], pt["y"], pt["z"]
        c.last_int_val = pt["intensity"]
        c.last_rn, c.last_nr = pt["rn"], pt["nr"]
        c.last_class_flags = pt["cf"]
        c.last_sc = sc
        c.last_scan_dir, c.last_eof = pt["sd"], pt["eof"]
        c.last_cls = pt["cls"]
        c.last_user = pt["user"]
        c.last_scan_angle = pt["sa"]
        c.last_psid = pt["psid"]
        c.last_gps = pt["gps"]
        c.last_gpstime[0] = pt["gps"]
        for i in range(8):
            c.last_z[i] = pt["z"]
            c.last_intensity[i] = pt["intensity"]
        self.last_channel = sc
        return sc

    def compress(self, pt: dict) -> int:
        """Returns the channel for downstream codecs (the scArg
        quirk: 0 unless this point switched channels)."""
        sc = pt["sc"]
        prev = self.ctxs[self.last_channel]
        lpr = ((1 if prev.last_rn == 1 else 0)
               | (2 if prev.last_rn >= prev.last_nr else 0)
               | (4 if prev.gps_time_change else 0))

        c = self.ctxs[sc]
        old = c if c.have_last else prev

        gps_changed = pt["gps"] != old.last_gps
        psid_changed = pt["psid"] != old.last_psid
        sa_changed = pt["sa"] != old.last_scan_angle
        last_n = old.last_nr
        last_r = old.last_rn
        n = pt["nr"]
        r = pt["rn"]
        rn_inc = r == (last_r + 1) % 16
        rn_dec = r == (last_r + 15) % 16
        rn_misc = (r != last_r) and not rn_inc and not rn_dec

        changed = ((1 if (rn_inc or rn_misc) else 0)
                   | ((1 if (rn_dec or rn_misc) else 0) << 1)
                   | ((1 if n != last_n else 0) << 2)
                   | ((1 if sa_changed else 0) << 3)
                   | ((1 if gps_changed else 0) << 4)
                   | ((1 if psid_changed else 0) << 5)
                   | ((1 if sc != self.last_channel else 0) << 6))
        enc = self.xy.enc
        enc.encode_symbol(
            _lazy(prev.changed_values_model, lpr, 128), changed)

        channel_out = 0
        if sc != self.last_channel:
            if prev.scanner_channel_model is None:
                prev.scanner_channel_model = _SymModel(3)
            d = sc - self.last_channel - 1
            enc.encode_symbol(prev.scanner_channel_model,
                              d if d >= 0 else d + 4)

        if not c.have_last:
            c.copy_last_from(prev)
        c.last_sc = sc

        if n != last_n:
            enc.encode_symbol(_lazy(c.nr_model, last_n, 16), n)
        c.last_nr = n

        if rn_misc:
            if gps_changed:
                enc.encode_symbol(_lazy(c.rn_model, last_r, 16), r)
            else:
                if c.rn_gps_same_model is None:
                    c.rn_gps_same_model = _SymModel(13)
                diff = r - last_r
                enc.encode_symbol(
                    c.rn_gps_same_model,
                    diff - 2 if diff > 1 else diff - 2 + 16)
        c.last_rn = r

        ctx = (_MAP6[n][r] << 1) | (1 if gps_changed else 0)
        # X / Y
        med = c.mx[ctx].get()
        diff = _i32(pt["x"] - c.last_x)
        c.dx.compress(enc, med, diff, 1 if n == 1 else 0)
        c.mx[ctx].add(diff)
        kbits = min(c.dx.k, 20) & ~1
        med = c.my[ctx].get()
        diff = _i32(pt["y"] - c.last_y)
        c.dy.compress(enc, med, diff,
                      kbits | (1 if n == 1 else 0))
        c.my[ctx].add(diff)
        c.last_x, c.last_y = pt["x"], pt["y"]
        # Z
        kbits = min((c.dx.k + c.dy.k) // 2, 18) & ~1
        zctx = _LEVEL8[n][r]
        c.z.compress(self.z.enc, c.last_z[zctx], pt["z"],
                     kbits | (1 if n == 1 else 0))
        c.last_z[zctx] = pt["z"]
        c.last_z_val = pt["z"]
        # Classification
        cctx = ((1 if (r == 1 and r >= n) else 0)
                | ((c.last_cls & 0x1F) << 1))
        if pt["cls"] != c.last_cls:
            self.cls.make_valid()
        self.cls.enc.encode_symbol(
            _lazy(c.class_model, cctx, 256), pt["cls"])
        c.last_cls = pt["cls"]
        # Flags
        fl = pt["cf"] | (pt["sd"] << 4) | (pt["eof"] << 5)
        last_fl = (c.last_class_flags | (c.last_scan_dir << 4)
                   | (c.last_eof << 5))
        if fl != last_fl:
            self.flags.make_valid()
        self.flags.enc.encode_symbol(
            _lazy(c.flag_model, last_fl, 64), fl)
        c.last_class_flags = pt["cf"]
        c.last_scan_dir = pt["sd"]
        c.last_eof = pt["eof"]
        # Intensity
        ictx = ((1 if gps_changed else 0)
                | ((1 if r >= n else 0) << 1)
                | ((1 if r == 1 else 0) << 2))
        if pt["intensity"] != c.last_int_val:
            self.inten.make_valid()
        c.intensity.compress(self.inten.enc, c.last_intensity[ictx],
                             pt["intensity"], ictx >> 1)
        c.last_intensity[ictx] = pt["intensity"]
        c.last_int_val = pt["intensity"]
        # Scan angle
        if pt["sa"] != c.last_scan_angle:
            self.sa.make_valid()
            c.scan_angle.compress(self.sa.enc,
                                  c.last_scan_angle, pt["sa"],
                                  1 if gps_changed else 0)
            c.last_scan_angle = pt["sa"]
        # User data
        uctx = c.last_user // 4
        if pt["user"] != c.last_user:
            self.ud.make_valid()
        self.ud.enc.encode_symbol(
            _lazy(c.user_data_model, uctx, 256), pt["user"])
        c.last_user = pt["user"]
        # Point source ID
        if psid_changed:
            self.psid.make_valid()
            c.psid.compress(self.psid.enc, c.last_psid,
                            pt["psid"], 0)
            c.last_psid = pt["psid"]
        # GPS time
        if gps_changed:
            self._encode_gps(pt["gps"], c)

        if sc != self.last_channel:
            channel_out = sc
        self.last_channel = sc
        c.gps_time_change = bool(gps_changed)
        c.last_gps = pt["gps"]
        return channel_out

    def _encode_gps(self, gps: int, c: _CtxC14):
        """encodeGpsTime (field_point14.cpp:378-528) on the
        double's 64-bit pattern."""
        self.gps.make_valid()
        enc = self.gps.enc
        if c.gpstime_0diff_model is None:
            c.gpstime_0diff_model = _SymModel(5)
        if c.gpstime_multi_model is None:
            c.gpstime_multi_model = _SymModel(515)

        def find_seq(start):
            for i in range(start, 4):
                seq = (c.last_gps_seq + i) & 3
                d64 = _i64(_i64(gps) - _i64(c.last_gpstime[seq]))
                d32 = _i32(d64)
                if d64 == d32:
                    return i, d32
            return -1, 0

        while True:
            seq = c.last_gps_seq
            if c.last_gpstime_diff[seq] == 0:
                idx, diff = find_seq(0)
                if idx == 0:
                    enc.encode_symbol(c.gpstime_0diff_model, 0)
                    c.gpstime.compress(enc, 0, diff, 0)
                    c.last_gpstime_diff[seq] = diff
                    c.multi_extreme_counter[seq] = 0
                elif idx > 0:
                    enc.encode_symbol(c.gpstime_0diff_model,
                                      idx + 1)
                    c.last_gps_seq = (seq + idx) & 3
                    continue
                else:
                    enc.encode_symbol(c.gpstime_0diff_model, 1)
                    c.gpstime.compress(
                        enc, _i32(c.last_gpstime[seq] >> 32),
                        _i32(gps >> 32), 8)
                    enc.write_int(gps & _U32)
                    c.next_gps_seq = (c.next_gps_seq + 1) & 3
                    c.last_gps_seq = c.next_gps_seq
                    c.last_gpstime_diff[c.last_gps_seq] = 0
                    c.multi_extreme_counter[c.last_gps_seq] = 0
                c.last_gpstime[c.last_gps_seq] = gps
            else:
                d64 = _i64(_i64(gps) - _i64(c.last_gpstime[seq]))
                diff = _i32(d64)
                if d64 == diff:
                    # multiplier via FLOAT division + round-half-
                    # away (field_point14.cpp:432)
                    f = (np.float32(diff)
                         / np.float32(c.last_gpstime_diff[seq]))
                    multi = int(np.floor(np.float64(f) + 0.5)
                                if f >= 0
                                else -np.floor(-np.float64(f) + 0.5))
                    if 0 < multi < _GPS_MULTI:
                        tag = 1 if multi == 1 else (
                            2 if multi < 10 else 3)
                        enc.encode_symbol(c.gpstime_multi_model,
                                          multi)
                        c.gpstime.compress(
                            enc,
                            _i32(multi * c.last_gpstime_diff[seq]),
                            diff, tag)
                        if tag == 1:
                            c.multi_extreme_counter[seq] = 0
                    elif multi >= _GPS_MULTI:
                        enc.encode_symbol(c.gpstime_multi_model,
                                          _GPS_MULTI)
                        c.gpstime.compress(
                            enc,
                            _i32(_GPS_MULTI
                                 * c.last_gpstime_diff[seq]),
                            diff, 4)
                        c.multi_extreme_counter[seq] += 1
                        if c.multi_extreme_counter[seq] > 3:
                            c.multi_extreme_counter[seq] = 0
                            c.last_gpstime_diff[seq] = diff
                    elif multi < 0 and multi > _GPS_MULTI_MINUS:
                        enc.encode_symbol(c.gpstime_multi_model,
                                          _GPS_MULTI - multi)
                        c.gpstime.compress(
                            enc,
                            _i32(multi * c.last_gpstime_diff[seq]),
                            diff, 5)
                    elif multi <= _GPS_MULTI_MINUS:
                        enc.encode_symbol(
                            c.gpstime_multi_model,
                            _GPS_MULTI - _GPS_MULTI_MINUS)
                        c.gpstime.compress(
                            enc,
                            _i32(_GPS_MULTI_MINUS
                                 * c.last_gpstime_diff[seq]),
                            diff, 6)
                        c.multi_extreme_counter[seq] += 1
                        if c.multi_extreme_counter[seq] > 3:
                            c.multi_extreme_counter[seq] = 0
                            c.last_gpstime_diff[seq] = diff
                    else:  # multi == 0
                        enc.encode_symbol(c.gpstime_multi_model, 0)
                        c.gpstime.compress(enc, 0, diff, 7)
                        c.multi_extreme_counter[seq] += 1
                        if c.multi_extreme_counter[seq] > 3:
                            c.multi_extreme_counter[seq] = 0
                            c.last_gpstime_diff[seq] = diff
                else:
                    idx, _ = find_seq(1)
                    if idx > 0:
                        enc.encode_symbol(
                            c.gpstime_multi_model,
                            _GPS_MULTI_CODE_FULL + idx)
                        c.last_gps_seq = (seq + idx) & 3
                        continue
                    enc.encode_symbol(c.gpstime_multi_model,
                                      _GPS_MULTI_CODE_FULL)
                    c.gpstime.compress(
                        enc, _i32(c.last_gpstime[seq] >> 32),
                        _i32(gps >> 32), 8)
                    enc.write_int(gps & _U32)
                    c.next_gps_seq = (c.next_gps_seq + 1) & 3
                    c.last_gps_seq = c.next_gps_seq
                    c.last_gpstime_diff[c.last_gps_seq] = 0
                    c.multi_extreme_counter[c.last_gps_seq] = 0
                c.last_gpstime[c.last_gps_seq] = gps
            break


class _RgbCtxC:
    __slots__ = ("used_model", "diff_model", "have_last", "last")

    def __init__(self):
        self.used_model = None
        self.diff_model = [None] * 6
        self.have_last = False
        self.last = (0, 0, 0)


class _Rgb14C:
    """Rgb14Compressor (field_rgb14.cpp:68-170), including the v3
    last-pointer quirk (the running color may live in the previous
    channel's context)."""

    def __init__(self):
        self.layer = _Layer()
        self.ctxs = [_RgbCtxC() for _ in range(4)]
        self.last_channel = -1

    def first(self, rgb: tuple, sc: int):
        c = self.ctxs[sc]
        c.last = rgb
        c.have_last = True
        self.last_channel = sc

    def compress(self, rgb: tuple, sc: int):
        c = self.ctxs[sc]
        ref = self.ctxs[self.last_channel]
        if not c.have_last:
            c.have_last = True
            c.last = ref.last
            ref = c
        lr, lg, lb = ref.last
        r, g, b = rgb
        enc = self.layer.enc

        def dbit(a, bb, mask):
            return 1 if (a ^ bb) & mask else 0

        sym = (dbit(lr, r, 0x00FF)
               | (dbit(lr, r, 0xFF00) << 1)
               | (dbit(lg, g, 0x00FF) << 2)
               | (dbit(lg, g, 0xFF00) << 3)
               | (dbit(lb, b, 0x00FF) << 4)
               | (dbit(lb, b, 0xFF00) << 5)
               | ((1 if (dbit(r, g, 0x00FF) or dbit(r, b, 0x00FF)
                         or dbit(r, g, 0xFF00)
                         or dbit(r, b, 0xFF00)) else 0) << 6))
        if sym:
            self.layer.make_valid()
        if c.used_model is None:
            c.used_model = _SymModel(128)
        enc.encode_symbol(c.used_model, sym)

        diff_l = 0
        diff_h = 0
        if sym & 1:
            diff_l = (r & 0xFF) - (lr & 0xFF)
            enc.encode_symbol(_lazy(c.diff_model, 0, 256),
                              diff_l & 0xFF)
        if sym & 2:
            diff_h = (r >> 8) - (lr >> 8)
            enc.encode_symbol(_lazy(c.diff_model, 1, 256),
                              diff_h & 0xFF)
        if sym & 64:
            if sym & 4:
                corr = (g & 0xFF) - _clamp_u8(diff_l + (lg & 0xFF))
                enc.encode_symbol(_lazy(c.diff_model, 2, 256),
                                  corr & 0xFF)
            if sym & 16:
                diff_l = _div2t(diff_l + (g & 0xFF) - (lg & 0xFF))
                corr = (b & 0xFF) - _clamp_u8(diff_l + (lb & 0xFF))
                enc.encode_symbol(_lazy(c.diff_model, 4, 256),
                                  corr & 0xFF)
            if sym & 8:
                corr = (g >> 8) - _clamp_u8(diff_h + (lg >> 8))
                enc.encode_symbol(_lazy(c.diff_model, 3, 256),
                                  corr & 0xFF)
            if sym & 32:
                diff_h = _div2t(diff_h + (g >> 8) - (lg >> 8))
                corr = (b >> 8) - _clamp_u8(diff_h + (lb >> 8))
                enc.encode_symbol(_lazy(c.diff_model, 5, 256),
                                  corr & 0xFF)
        ref.last = rgb
        self.last_channel = sc


class _NirCtxC:
    __slots__ = ("used_model", "diff_model", "have_last", "last")

    def __init__(self):
        self.used_model = None
        self.diff_model = [None, None]
        self.have_last = False
        self.last = 0


class _Nir14C:
    """Nir14Compressor (field_nir14.cpp:38-105)."""

    def __init__(self):
        self.layer = _Layer()
        self.ctxs = [_NirCtxC() for _ in range(4)]
        self.last_channel = -1

    def first(self, nir: int, sc: int):
        c = self.ctxs[sc]
        c.last = nir
        c.have_last = True
        self.last_channel = sc

    def compress(self, nir: int, sc: int):
        c = self.ctxs[sc]
        ref = self.ctxs[self.last_channel]
        if not c.have_last:
            c.have_last = True
            c.last = ref.last
            ref = c
        last = ref.last
        lo = (last & 0xFF) != (nir & 0xFF)
        hi = (last & 0xFF00) != (nir & 0xFF00)
        sym = (1 if lo else 0) | ((1 if hi else 0) << 1)
        if sym:
            self.layer.make_valid()
        if c.used_model is None:
            c.used_model = _SymModel(4)
        enc = self.layer.enc
        enc.encode_symbol(c.used_model, sym)
        if lo:
            enc.encode_symbol(_lazy(c.diff_model, 0, 256),
                              ((nir & 0xFF) - (last & 0xFF)) & 0xFF)
        if hi:
            enc.encode_symbol(_lazy(c.diff_model, 1, 256),
                              ((nir >> 8) - (last >> 8)) & 0xFF)
        ref.last = nir
        self.last_channel = sc


class _ByteCtxC:
    __slots__ = ("byte_model", "have_last", "last")

    def __init__(self, count):
        self.byte_model = [None] * count
        self.have_last = False
        self.last = [0] * count


class _Byte14C:
    """Byte14Compressor (field_byte14.cpp:48-120): one stream per
    extra byte, valid per-stream on first change."""

    def __init__(self, count: int):
        self.count = count
        self.layers = [_Layer() for _ in range(count)]
        self.ctxs = [_ByteCtxC(count) for _ in range(4)]
        self.last_channel = -1

    def first(self, raw: bytes, sc: int):
        c = self.ctxs[sc]
        c.last = list(raw)
        c.have_last = True
        self.last_channel = sc

    def compress(self, raw: bytes, sc: int):
        c = self.ctxs[sc]
        ref = self.ctxs[self.last_channel]
        if not c.have_last:
            c.have_last = True
            c.last = list(ref.last)
            ref = c
        for i in range(self.count):
            diff = (raw[i] - ref.last[i]) & 0xFF
            self.layers[i].enc.encode_symbol(
                _lazy(c.byte_model, i, 256), diff)
            if diff:
                self.layers[i].make_valid()
                ref.last[i] = raw[i]
        self.last_channel = sc


def compress_chunk14(rec: np.ndarray, fmt: int, eb: int) -> bytes:
    """Encode ONE layered chunk from a record array in the
    sources.las._record_dtype(fmt) layout. The chunk is fully
    independent (fresh models, raw first point, per-layer
    streams)."""
    has_rgb = fmt in (7, 8)
    has_nir = fmt == 8
    n = len(rec)
    if n == 0:
        raise ValueError("laz: empty layered chunk")
    # native C kernel when available (byte-identity with this
    # Python body pinned in tests/test_native_lazdec14.py)
    from pdal_spark.native import lazenc14_native

    native = lazenc14_native()
    if native is not None:
        return native(np.ascontiguousarray(rec).tobytes(), n, fmt,
                      eb, rec.dtype.itemsize)

    gps_bits = rec["gps"].view("<u8")
    ebs = None
    if eb:
        base = rec.dtype.itemsize - eb
        ebs = rec.view("u1").reshape(n, rec.dtype.itemsize)[
            :, base:base + eb]

    def pt(i: int) -> dict:
        fl = int(rec["flags"][i])
        rt = int(rec["returns"][i])
        return {
            "x": int(rec["X"][i]), "y": int(rec["Y"][i]),
            "z": int(rec["Z"][i]),
            "intensity": int(rec["Intensity"][i]),
            "rn": rt & 0xF, "nr": rt >> 4,
            "cf": fl & 0xF, "sc": (fl >> 4) & 3,
            "sd": (fl >> 6) & 1, "eof": (fl >> 7) & 1,
            "cls": int(rec["cls"][i]),
            "user": int(rec["user"][i]),
            "sa": int(rec["scan_angle"][i]),
            "psid": int(rec["psid"][i]),
            "gps": int(gps_bits[i]),
        }

    p14 = _Point14C()
    rgb = _Rgb14C() if has_rgb else None
    nir = _Nir14C() if has_nir else None
    byt = _Byte14C(eb) if eb else None

    out = bytearray()
    # raw first point fields, in item order (lazperf.cpp:175-185)
    p0 = pt(0)
    out += struct.pack(
        "<iiiHBBBBhH", p0["x"], p0["y"], p0["z"], p0["intensity"],
        (p0["nr"] << 4) | p0["rn"],
        p0["cf"] | (p0["sc"] << 4) | (p0["sd"] << 6)
        | (p0["eof"] << 7),
        p0["cls"], p0["user"], p0["sa"], p0["psid"])
    out += struct.pack("<Q", p0["gps"])
    sc0 = p14.first(p0)
    if has_rgb:
        c0 = (int(rec["red"][0]), int(rec["green"][0]),
              int(rec["blue"][0]))
        out += struct.pack("<HHH", *c0)
        rgb.first(c0, sc0)
    if has_nir:
        n0 = int(rec["nir"][0])
        out += struct.pack("<H", n0)
        nir.first(n0, sc0)
    if eb:
        raw0 = bytes(ebs[0])
        out += raw0
        byt.first(raw0, sc0)

    for i in range(1, n):
        p = pt(i)
        chan = p14.compress(p)
        if has_rgb:
            rgb.compress((int(rec["red"][i]), int(rec["green"][i]),
                          int(rec["blue"][i])), chan)
        if has_nir:
            nir.compress(int(rec["nir"][i]), chan)
        if eb:
            byt.compress(bytes(ebs[i]), chan)

    # framing: u32 point count, per-layer sizes, per-layer data
    out += struct.pack("<I", n)
    blobs = [lay.finish() for lay in p14.layers()]
    if has_rgb:
        blobs.append(rgb.layer.finish())
    if has_nir:
        blobs.append(nir.layer.finish())
    if eb:
        blobs.extend(lay.finish() for lay in byt.layers)
    for b in blobs:
        out += struct.pack("<I", len(b))
    for b in blobs:
        out += b
    return bytes(out)
