"""Pure-Python LASzip *layered* (compressor 3) decompressor — LAS
1.4 point formats 6-8, item codecs POINT14 / RGB14 / RGBNIR14 /
BYTE14 version 3. This is the format every modern LAS 1.4 .laz and
every COPC file uses.

Derivation: implemented from the published LAZ 1.4 extension spec
(Isenburg, "LASzip: lossless compression of LiDAR data", PE&RS 2013;
the layered extension is specified in the LASzip DRAFT spec for
native LAS 1.4 support). Reference parity was studied against the
reference's vendored lazperf — behavior, not code
(vendor/lazperf/detail/field_point14.cpp:600-920 decompressor +
context scheme, field_rgb14.cpp:175-292, field_nir14.cpp:120-180,
field_byte14.cpp:125-180, lazperf.cpp:398-530 layer framing,
readers.cpp:282-375 variable-size chunk table): this module is an
independent Python implementation sharing `sources.lazdec`'s
arithmetic decoder, adaptive models, integer corrector and
streaming-median primitives.

Layered chunk layout (lazperf.cpp:418-441): each chunk is fully
independent — [raw first point: 30B point14, +6B rgb (fmt 7/8),
+2B nir (fmt 8), +eb extra bytes][u32 point count][per-layer u32
byte sizes: 9 for point14 (xy, z, class, flags, intensity,
scan_angle, user_data, psid, gpstime), 1 rgb, 1 nir, eb byte
layers][the layers' compressed bytes, same order]. A zero-size
layer means the field never changed in the chunk and decodes to the
running prediction. Chunk independence is what makes one-task-per-
chunk Spark parallelism (sources.las.read_las_chunked) correct.

Validation is INDEPENDENT: tests decode the reference's COPC
fixtures (test/data/copc/1.2-with-color.copc.laz — format 7, 1065
points) and compare the full point multiset against the proven
uncompressed reader on the same capture's .las twin
(test/data/las/1.2-with-color.las), plus round-trips through our
own layered encoder checked against lazperf-written streams.
"""

from __future__ import annotations

import struct

import numpy as np

from pdal_spark.sources.lazdec import (
    _Decoder,
    _IntDecompressor,
    _Median5,
    _Reader,
    _SymModel,
    _i32,
)

_U32 = 0xFFFFFFFF
_U64 = 0xFFFFFFFFFFFFFFFF

# Spec constant context tables for the 1.4 scheme, indexed [n][r]
# (field_point14.cpp:37-76; these differ from the 8x8 POINT10
# tables — 16 return values in LAS 1.4).
_MAP6 = (
    (0, 1, 2, 3, 4, 5, 3, 4, 4, 5, 5, 5, 5, 5, 5, 5),
    (1, 0, 1, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3),
    (2, 1, 2, 4, 4, 4, 4, 4, 4, 4, 4, 3, 3, 3, 3, 3),
    (3, 3, 4, 5, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4),
    (4, 3, 4, 4, 5, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4),
    (5, 3, 4, 4, 4, 5, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4),
    (3, 3, 4, 4, 4, 4, 5, 4, 4, 4, 4, 4, 4, 4, 4, 4),
    (4, 3, 4, 4, 4, 4, 4, 5, 4, 4, 4, 4, 4, 4, 4, 4),
    (4, 3, 4, 4, 4, 4, 4, 4, 5, 4, 4, 4, 4, 4, 4, 4),
    (5, 3, 4, 4, 4, 4, 4, 4, 4, 5, 4, 4, 4, 4, 4, 4),
    (5, 3, 4, 4, 4, 4, 4, 4, 4, 4, 5, 4, 4, 4, 4, 4),
    (5, 3, 3, 4, 4, 4, 4, 4, 4, 4, 4, 5, 5, 4, 4, 4),
    (5, 3, 3, 4, 4, 4, 4, 4, 4, 4, 4, 5, 5, 5, 4, 4),
    (5, 3, 3, 4, 4, 4, 4, 4, 4, 4, 4, 4, 5, 5, 5, 4),
    (5, 3, 3, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 5, 5, 5),
    (5, 3, 3, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 5, 5),
)
# number_return_level_8ctx (field_point14.cpp:57-76) is exactly the
# |n-r| distance clamped to 7 — pinned cell-by-cell against the
# spec table literal in tests/test_lazdec14.py.
_LEVEL8 = tuple(
    tuple(min(abs(n - r), 7) for r in range(16)) for n in range(16))

_GPS_MULTI = 500
_GPS_MULTI_MINUS = -10
_GPS_MULTI_CODE_FULL = 511


def _i16(x: int) -> int:
    x &= 0xFFFF
    return x - 0x10000 if x >= 0x8000 else x


def _i64(x: int) -> int:
    x &= _U64
    return x - (1 << 64) if x >= (1 << 63) else x


def _clamp_u8(x: int) -> int:
    return 0 if x < 0 else (255 if x > 255 else x)


def _div2t(x: int) -> int:
    """C++ `/ 2` — truncates toward zero (python // floors)."""
    return x // 2 if x >= 0 else -((-x) // 2)


def _lazy(models: list, i: int, syms: int) -> _SymModel:
    m = models[i]
    if m is None:
        m = models[i] = _SymModel(syms)
    return m


class _Ctx14:
    """One scanner-channel context for the POINT14 layered codec
    (field_point14.hpp ChannelCtx). Models are lazily built — a
    model's decode behavior is deterministic from construction, so
    deferring construction to first use is behavior-identical and
    skips building the ~200 large symbol models per channel that
    short chunks never touch."""

    __slots__ = (
        "changed_values_model", "scanner_channel_model",
        "rn_gps_same_model", "nr_model", "rn_model", "class_model",
        "flag_model", "user_data_model", "gpstime_multi_model",
        "gpstime_0diff_model", "dx", "dy", "z", "intensity",
        "scan_angle", "psid", "gpstime", "have_last",
        "last_x", "last_y", "last_z_val", "last_int_val",
        "last_rn", "last_nr", "last_class_flags", "last_sc",
        "last_scan_dir", "last_eof", "last_cls", "last_user",
        "last_scan_angle", "last_psid", "last_gps",
        "last_intensity", "last_z", "mx", "my",
        "last_gps_seq", "next_gps_seq", "last_gpstime",
        "last_gpstime_diff", "multi_extreme_counter",
        "gps_time_change",
    )

    def __init__(self):
        self.changed_values_model = [None] * 8
        self.scanner_channel_model = None
        self.rn_gps_same_model = None
        self.nr_model = [None] * 16
        self.rn_model = [None] * 16
        self.class_model = [None] * 64
        self.flag_model = [None] * 64
        self.user_data_model = [None] * 64
        self.gpstime_multi_model = None
        self.gpstime_0diff_model = None
        self._make_codecs()
        self.have_last = False
        self.last_x = self.last_y = self.last_z_val = 0
        self.last_int_val = 0
        self.last_rn = self.last_nr = 0
        self.last_class_flags = self.last_sc = 0
        self.last_scan_dir = self.last_eof = 0
        self.last_cls = self.last_user = 0
        self.last_scan_angle = 0
        self.last_psid = 0
        self.last_gps = 0  # u64 bit pattern of the double
        self.last_intensity = [0] * 8
        self.last_z = [0] * 8
        self.mx = [_Median5() for _ in range(12)]
        self.my = [_Median5() for _ in range(12)]
        self.last_gps_seq = 0
        self.next_gps_seq = 0
        self.last_gpstime = [0, 0, 0, 0]  # u64 bit patterns
        self.last_gpstime_diff = [0, 0, 0, 0]
        self.multi_extreme_counter = [0, 0, 0, 0]
        self.gps_time_change = False

    def _make_codecs(self):
        """Integer codecs with the spec parameter set (bits,
        contexts); the compressor context subclass swaps in the
        encode-side twins."""
        self.dx = _IntDecompressor(32, 2)
        self.dy = _IntDecompressor(32, 22)
        self.z = _IntDecompressor(32, 20)
        self.intensity = _IntDecompressor(16, 4)
        self.scan_angle = _IntDecompressor(16, 2)
        self.psid = _IntDecompressor(16, 1)
        self.gpstime = _IntDecompressor(32, 9)

    def copy_last_from(self, o: "_Ctx14"):
        """Context init from the previous channel's running point
        (field_point14.cpp:666-676)."""
        self.have_last = True
        self.last_x, self.last_y = o.last_x, o.last_y
        self.last_z_val = o.last_z_val
        self.last_int_val = o.last_int_val
        self.last_rn, self.last_nr = o.last_rn, o.last_nr
        self.last_class_flags = o.last_class_flags
        self.last_sc = o.last_sc
        self.last_scan_dir, self.last_eof = o.last_scan_dir, o.last_eof
        self.last_cls, self.last_user = o.last_cls, o.last_user
        self.last_scan_angle = o.last_scan_angle
        self.last_psid = o.last_psid
        self.last_gps = o.last_gps
        for i in range(8):
            self.last_z[i] = o.last_z_val
            self.last_intensity[i] = o.last_int_val
        self.last_gpstime[0] = o.last_gps


class _Point14Layered:
    """POINT14 v3 decompressor over per-layer arithmetic streams
    (Point14Decompressor, field_point14.cpp:600-920)."""

    def __init__(self, xy, z, cls, flags, inten, sa, ud, psid, gps):
        # each arg: _Decoder or None (zero-size layer)
        self.xy, self.z_dec, self.cls_dec = xy, z, cls
        self.flags_dec, self.int_dec, self.sa_dec = flags, inten, sa
        self.ud_dec, self.psid_dec, self.gps_dec = ud, psid, gps
        self.ctxs = [_Ctx14() for _ in range(4)]
        self.last_channel = -1

    def first(self, raw: bytes) -> int:
        """Seed from the raw 30-byte first point; returns the
        scanner channel for downstream field codecs."""
        (x, y, z, inten, returns, flags, cls, user, sa,
         psid) = struct.unpack_from("<iiiHBBBBhH", raw, 0)
        (gps_bits,) = struct.unpack_from("<Q", raw, 22)
        sc = (flags >> 4) & 3
        c = self.ctxs[sc]
        c.have_last = True
        c.last_x, c.last_y, c.last_z_val = x, y, z
        c.last_int_val = inten
        c.last_rn = returns & 0xF
        c.last_nr = returns >> 4
        c.last_class_flags = flags & 0xF
        c.last_sc = sc
        c.last_scan_dir = (flags >> 6) & 1
        c.last_eof = (flags >> 7) & 1
        c.last_cls = cls
        c.last_user = user
        c.last_scan_angle = sa
        c.last_psid = psid
        c.last_gps = gps_bits
        c.last_gpstime[0] = gps_bits
        for i in range(8):
            c.last_z[i] = z
            c.last_intensity[i] = inten
        self.last_channel = sc
        return sc

    def next(self) -> tuple:
        """Decode one point; returns (x, y, z, intensity,
        returns_byte, flags_byte, classification, user_data,
        scan_angle, psid, gps_bits, channel_for_downstream)."""
        prev = self.ctxs[self.last_channel]
        lpr = ((1 if prev.last_rn == 1 else 0)
               | (2 if prev.last_rn >= prev.last_nr else 0)
               | (4 if prev.gps_time_change else 0))
        xy = self.xy
        changed = xy.decode_symbol(
            _lazy(prev.changed_values_model, lpr, 128))

        sc_changed = (changed >> 6) & 1
        psid_changed = (changed >> 5) & 1
        gps_changed = (changed >> 4) & 1
        sa_changed = (changed >> 3) & 1
        nr_changed = (changed >> 2) & 1
        rn_minus = (changed >> 1) & 1
        rn_plus = changed & 1

        sc = prev.last_sc
        # scArg mirrors the laszip quirk: downstream field codecs
        # see channel 0 unless THIS point switched channels
        # (lazperf.cpp:420 `int channel = 0`).
        channel_out = 0
        if sc_changed:
            if prev.scanner_channel_model is None:
                prev.scanner_channel_model = _SymModel(3)
            diff = xy.decode_symbol(prev.scanner_channel_model)
            sc = (sc + diff + 1) % 4
            self.last_channel = sc
            channel_out = sc

        c = self.ctxs[sc]
        if not c.have_last:
            c.copy_last_from(prev)
        c.last_sc = sc

        n = c.last_nr
        r = c.last_rn
        if nr_changed:
            n = xy.decode_symbol(_lazy(c.nr_model, c.last_nr, 16))
        c.last_nr = n

        if rn_plus and not rn_minus:
            r = (r + 1) % 16
        elif rn_minus and not rn_plus:
            r = (r + 15) % 16
        elif rn_plus and rn_minus:
            if gps_changed:
                r = xy.decode_symbol(_lazy(c.rn_model, r, 16))
            else:
                if c.rn_gps_same_model is None:
                    c.rn_gps_same_model = _SymModel(13)
                r = (r + xy.decode_symbol(c.rn_gps_same_model)
                     + 2) % 16
        c.last_rn = r

        ctx = (_MAP6[n][r] << 1) | gps_changed
        # X
        med = c.mx[ctx].get()
        diff = c.dx.decompress(xy, med, 1 if n == 1 else 0)
        c.last_x = _i32(c.last_x + diff)
        c.mx[ctx].add(diff)
        # Y
        kbits = min(c.dx.k, 20) & ~1
        med = c.my[ctx].get()
        diff = c.dy.decompress(
            xy, med, kbits | (1 if n == 1 else 0))
        c.last_y = _i32(c.last_y + diff)
        c.my[ctx].add(diff)
        # Z
        if self.z_dec is not None:
            kbits = min((c.dx.k + c.dy.k) // 2, 18) & ~1
            zctx = _LEVEL8[n][r]
            z = c.z.decompress(
                self.z_dec, c.last_z[zctx],
                kbits | (1 if n == 1 else 0))
            z = _i32(z)
            c.last_z_val = z
            c.last_z[zctx] = z
        # Classification
        if self.cls_dec is not None:
            cctx = ((1 if (r == 1 and r >= n) else 0)
                    | ((c.last_cls & 0x1F) << 1))
            c.last_cls = self.cls_dec.decode_symbol(
                _lazy(c.class_model, cctx, 256))
        # Flags (class flags + scan dir + eof; channel already done)
        if self.flags_dec is not None:
            last_fl = (c.last_class_flags | (c.last_scan_dir << 4)
                       | (c.last_eof << 5))
            fl = self.flags_dec.decode_symbol(
                _lazy(c.flag_model, last_fl, 64))
            c.last_eof = (fl >> 5) & 1
            c.last_scan_dir = (fl >> 4) & 1
            c.last_class_flags = fl & 0x0F
        # Intensity
        if self.int_dec is not None:
            ictx = (gps_changed
                    | ((1 if r >= n else 0) << 1)
                    | ((1 if r == 1 else 0) << 2))
            v = c.intensity.decompress(
                self.int_dec, c.last_intensity[ictx], ictx >> 1)
            c.last_intensity[ictx] = v
            c.last_int_val = v
        # Scan angle
        if sa_changed:
            c.last_scan_angle = _i16(c.scan_angle.decompress(
                self.sa_dec, c.last_scan_angle, gps_changed))
        # User data
        if self.ud_dec is not None:
            uctx = c.last_user // 4
            c.last_user = self.ud_dec.decode_symbol(
                _lazy(c.user_data_model, uctx, 256))
        # Point source ID
        if psid_changed:
            c.last_psid = c.psid.decompress(
                self.psid_dec, c.last_psid, 0)
        # GPS time
        if gps_changed:
            self._decode_gps(c)
        c.gps_time_change = bool(gps_changed)

        returns_byte = (c.last_nr << 4) | c.last_rn
        flags_byte = (c.last_class_flags | (sc << 4)
                      | (c.last_scan_dir << 6) | (c.last_eof << 7))
        return (c.last_x, c.last_y, c.last_z_val, c.last_int_val,
                returns_byte, flags_byte, c.last_cls, c.last_user,
                c.last_scan_angle, c.last_psid, c.last_gps,
                channel_out)

    def _decode_gps(self, c: _Ctx14):
        """field_point14.cpp:800-918 decodeGpsTime — all arithmetic
        on the double's 64-bit pattern."""
        dec = self.gps_dec
        if c.gpstime_0diff_model is None:
            c.gpstime_0diff_model = _SymModel(5)
        if c.gpstime_multi_model is None:
            c.gpstime_multi_model = _SymModel(515)
        while True:
            seq = c.last_gps_seq
            if c.last_gpstime_diff[seq] == 0:
                multi = dec.decode_symbol(c.gpstime_0diff_model)
                if multi == 0:
                    sym = c.gpstime.decompress(dec, 0, 0)
                    c.last_gpstime_diff[seq] = sym
                    c.last_gpstime[seq] = (
                        _i64(c.last_gpstime[seq]) + sym) & _U64
                    c.multi_extreme_counter[seq] = 0
                elif multi == 1:
                    c.next_gps_seq = (c.next_gps_seq + 1) & 3
                    sym = c.gpstime.decompress(
                        dec, _i32(c.last_gpstime[seq] >> 32), 8)
                    low = dec.read_int()
                    c.last_gpstime[c.next_gps_seq] = (
                        ((sym & _U32) << 32) | low)
                    c.last_gps_seq = c.next_gps_seq
                    c.last_gpstime_diff[c.last_gps_seq] = 0
                    c.multi_extreme_counter[c.last_gps_seq] = 0
                else:
                    c.last_gps_seq = (seq + multi - 1) & 3
                    continue
            else:
                multi = dec.decode_symbol(c.gpstime_multi_model)
                if multi == 1:
                    sym = c.gpstime.decompress(
                        dec, c.last_gpstime_diff[seq], 1)
                    c.last_gpstime[seq] = (
                        sym + c.last_gpstime[seq]) & _U64
                    c.multi_extreme_counter[seq] = 0
                elif multi < _GPS_MULTI_CODE_FULL:
                    if multi == 0:
                        gd = c.gpstime.decompress(dec, 0, 7)
                        c.multi_extreme_counter[seq] += 1
                        if c.multi_extreme_counter[seq] > 3:
                            c.multi_extreme_counter[seq] = 0
                            c.last_gpstime_diff[seq] = gd
                    elif multi < _GPS_MULTI:
                        tag = 2 if multi < 10 else 3
                        gd = c.gpstime.decompress(
                            dec,
                            _i32(multi * c.last_gpstime_diff[seq]),
                            tag)
                    elif multi == _GPS_MULTI:
                        gd = c.gpstime.decompress(
                            dec,
                            _i32(_GPS_MULTI
                                 * c.last_gpstime_diff[seq]), 4)
                        c.multi_extreme_counter[seq] += 1
                        if c.multi_extreme_counter[seq] > 3:
                            c.multi_extreme_counter[seq] = 0
                            c.last_gpstime_diff[seq] = gd
                    else:
                        neg = _GPS_MULTI - multi
                        if neg > _GPS_MULTI_MINUS:
                            gd = c.gpstime.decompress(
                                dec,
                                _i32(neg
                                     * c.last_gpstime_diff[seq]), 5)
                        else:
                            gd = c.gpstime.decompress(
                                dec,
                                _i32(_GPS_MULTI_MINUS
                                     * c.last_gpstime_diff[seq]), 6)
                            c.multi_extreme_counter[seq] += 1
                            if c.multi_extreme_counter[seq] > 3:
                                c.multi_extreme_counter[seq] = 0
                                c.last_gpstime_diff[seq] = gd
                    c.last_gpstime[seq] = (
                        _i64(c.last_gpstime[seq]) + gd) & _U64
                elif multi == _GPS_MULTI_CODE_FULL:
                    c.next_gps_seq = (c.next_gps_seq + 1) & 3
                    sym = c.gpstime.decompress(
                        dec, _i32(c.last_gpstime[seq] >> 32), 8)
                    low = dec.read_int()
                    c.last_gpstime[c.next_gps_seq] = (
                        ((sym & _U32) << 32) | low)
                    c.last_gps_seq = c.next_gps_seq
                    c.last_gpstime_diff[c.last_gps_seq] = 0
                    c.multi_extreme_counter[c.last_gps_seq] = 0
                else:
                    c.last_gps_seq = (
                        seq + multi - _GPS_MULTI_CODE_FULL) & 3
                    continue
            break
        c.last_gps = c.last_gpstime[c.last_gps_seq]


class _RgbCtx14:
    __slots__ = ("used_model", "diff_model", "have_last", "last")

    def __init__(self):
        self.used_model = None
        self.diff_model = [None] * 6
        self.have_last = False
        self.last = (0, 0, 0)


class _Rgb14Layered:
    """RGB14 v3 (field_rgb14.cpp:175-292), with the documented v3
    last-pointer quirk mirrored exactly: when the channel switches
    to one that already has state, the running color still lives in
    (and updates) the PREVIOUS channel's context."""

    def __init__(self, dec):
        self.dec = dec  # None when layer size == 0
        self.ctxs = [_RgbCtx14() for _ in range(4)]
        self.last_channel = -1

    def first(self, raw: bytes, sc: int) -> tuple:
        rgb = struct.unpack("<HHH", raw)
        c = self.ctxs[sc]
        c.last = rgb
        c.have_last = True
        self.last_channel = sc
        return rgb

    def next(self, sc: int) -> tuple:
        if self.dec is None:
            return self.ctxs[self.last_channel].last
        c = self.ctxs[sc]
        ref = self.ctxs[self.last_channel]
        if sc != self.last_channel:
            self.last_channel = sc
            if not c.have_last:
                c.have_last = True
                c.last = ref.last
                ref = c
        lr, lg, lb = ref.last
        dec = self.dec
        if c.used_model is None:
            c.used_model = _SymModel(128)
        sym = dec.decode_symbol(c.used_model)
        if sym & 1:
            corr = dec.decode_symbol(_lazy(c.diff_model, 0, 256))
            r = (corr + (lr & 0xFF)) & 0xFF
        else:
            r = lr & 0xFF
        if sym & 2:
            corr = dec.decode_symbol(_lazy(c.diff_model, 1, 256))
            r |= ((corr + (lr >> 8)) & 0xFF) << 8
        else:
            r |= lr & 0xFF00
        if sym & 64:
            diff = (r & 0xFF) - (lr & 0xFF)
            if sym & 4:
                corr = dec.decode_symbol(_lazy(c.diff_model, 2, 256))
                g = (corr + _clamp_u8(diff + (lg & 0xFF))) & 0xFF
            else:
                g = lg & 0xFF
            if sym & 16:
                corr = dec.decode_symbol(_lazy(c.diff_model, 4, 256))
                diff2 = _div2t(diff + ((g & 0xFF) - (lg & 0xFF)))
                b = (corr + _clamp_u8(diff2 + (lb & 0xFF))) & 0xFF
            else:
                b = lb & 0xFF
            diff = (r >> 8) - (lr >> 8)
            if sym & 8:
                corr = dec.decode_symbol(_lazy(c.diff_model, 3, 256))
                g |= ((corr + _clamp_u8(diff + (lg >> 8))) & 0xFF) << 8
            else:
                g |= lg & 0xFF00
            if sym & 32:
                corr = dec.decode_symbol(_lazy(c.diff_model, 5, 256))
                diff2 = _div2t(diff + ((g >> 8) - (lg >> 8)))
                b |= ((corr + _clamp_u8(diff2 + (lb >> 8)))
                      & 0xFF) << 8
            else:
                b |= lb & 0xFF00
        else:
            g = r
            b = r
        ref.last = (r, g, b)
        return (r, g, b)


class _NirCtx14:
    __slots__ = ("used_model", "diff_model", "have_last", "last")

    def __init__(self):
        self.used_model = None
        self.diff_model = [None, None]
        self.have_last = False
        self.last = 0


class _Nir14Layered:
    """RGBNIR14's NIR component, v3 (field_nir14.cpp:120-180)."""

    def __init__(self, dec):
        self.dec = dec
        self.ctxs = [_NirCtx14() for _ in range(4)]
        self.last_channel = -1

    def first(self, raw: bytes, sc: int) -> int:
        (val,) = struct.unpack("<H", raw)
        c = self.ctxs[sc]
        c.last = val
        c.have_last = True
        self.last_channel = sc
        return val

    def next(self, sc: int) -> int:
        if self.dec is None:
            return self.ctxs[self.last_channel].last
        c = self.ctxs[sc]
        ref = self.ctxs[self.last_channel]
        if sc != self.last_channel:
            self.last_channel = sc
            if not c.have_last:
                c.have_last = True
                c.last = ref.last
                ref = c
        last = ref.last
        dec = self.dec
        if c.used_model is None:
            c.used_model = _SymModel(4)
        sym = dec.decode_symbol(c.used_model)
        if sym & 1:
            corr = dec.decode_symbol(_lazy(c.diff_model, 0, 256))
            val = (corr + (last & 0xFF)) & 0xFF
        else:
            val = last & 0xFF
        if sym & 2:
            corr = dec.decode_symbol(_lazy(c.diff_model, 1, 256))
            val |= ((corr + (last >> 8)) & 0xFF) << 8
        else:
            val |= last & 0xFF00
        ref.last = val
        return val


class _ByteCtx14:
    __slots__ = ("byte_model", "have_last", "last")

    def __init__(self, count: int):
        self.byte_model = [None] * count
        self.have_last = False
        self.last = [0] * count


class _Byte14Layered:
    """BYTE14 v3 — one arithmetic stream per extra byte
    (field_byte14.cpp:125-180)."""

    def __init__(self, decs: list):
        self.decs = decs  # per-byte _Decoder or None
        self.count = len(decs)
        self.ctxs = [_ByteCtx14(self.count) for _ in range(4)]
        self.last_channel = -1

    def first(self, raw: bytes, sc: int) -> bytes:
        c = self.ctxs[sc]
        c.last = list(raw)
        c.have_last = True
        self.last_channel = sc
        return raw

    def next(self, sc: int) -> bytes:
        c = self.ctxs[sc]
        ref = self.ctxs[self.last_channel]
        if sc != self.last_channel:
            self.last_channel = sc
            if not c.have_last:
                c.have_last = True
                c.last = list(ref.last)
                ref = c
        out = bytearray(self.count)
        for i in range(self.count):
            dec = self.decs[i]
            if dec is not None:
                v = (ref.last[i] + dec.decode_symbol(
                    _lazy(c.byte_model, i, 256))) & 0xFF
                ref.last[i] = v
                out[i] = v
            else:
                out[i] = ref.last[i]
        return bytes(out)


def _layer_decoder(data: bytes, start: int, size: int):
    """A fresh arithmetic decoder over one layer's byte slice, or
    None for a zero-size layer (decoders::arithmetic::initStream)."""
    if size == 0:
        return None
    dec = _Decoder(_Reader(data, start))
    dec.read_init_bytes()
    return dec


def decompress_chunk14(data: bytes, start: int, n_pts: int,
                       fmt: int, eb: int,
                       point_size: int) -> np.ndarray:
    """Decode ONE layered chunk (fully independent by design) into
    a record array matching sources.las._record_dtype(fmt).

    Dispatches to the native C kernel (pdal_spark/native/lazdec14.c,
    compiled on first use, byte-equivalence pinned in
    tests/test_native_lazdec14.py) when available; this pure-Python
    body is the reference implementation and the fallback
    (PDAL_SPARK_NO_NATIVE=1 forces it)."""
    if n_pts <= 0:
        from pdal_spark.sources.las import _record_dtype

        return np.zeros(0, dtype=_record_dtype(fmt, point_size))
    from pdal_spark.native import lazdec14_native

    native = lazdec14_native()
    if native is not None:
        from pdal_spark.sources.las import _record_dtype

        buf = np.zeros(n_pts * point_size, dtype=np.uint8)
        native(bytes(data), start, n_pts, fmt, eb, point_size, buf)
        return buf.view(_record_dtype(fmt, point_size))
    has_rgb = fmt in (7, 8)
    has_nir = fmt == 8
    pos = start
    p14_raw = data[pos:pos + 30]
    pos += 30
    rgb_raw = nir_raw = eb_raw = b""
    if has_rgb:
        rgb_raw = data[pos:pos + 6]
        pos += 6
    if has_nir:
        nir_raw = data[pos:pos + 2]
        pos += 2
    if eb:
        eb_raw = data[pos:pos + eb]
        pos += eb
    # u32 chunk point count (written after the raw first point —
    # lazperf.cpp:186 "weird, but...")
    (stored_count,) = struct.unpack_from("<I", data, pos)
    pos += 4
    if stored_count != n_pts:
        raise ValueError(
            f"laz: layered chunk says {stored_count} points, "
            f"plan says {n_pts}")
    sizes = list(struct.unpack_from("<9I", data, pos))
    pos += 36
    rgb_cnt = nir_cnt = 0
    byte_cnts: list[int] = []
    if has_rgb:
        (rgb_cnt,) = struct.unpack_from("<I", data, pos)
        pos += 4
    if has_nir:
        (nir_cnt,) = struct.unpack_from("<I", data, pos)
        pos += 4
    if eb:
        byte_cnts = list(struct.unpack_from(f"<{eb}I", data, pos))
        pos += 4 * eb
    # layer slices, in write order
    offs = []
    for s in sizes + [rgb_cnt, nir_cnt] + byte_cnts:
        offs.append(pos)
        pos += s

    all_sizes = sizes + [rgb_cnt, nir_cnt] + byte_cnts
    decs = [_layer_decoder(data, offs[i], all_sizes[i])
            for i in range(len(all_sizes))]
    if decs[0] is None:
        raise ValueError("laz: layered chunk with empty xy layer")
    p14 = _Point14Layered(*decs[:9])
    rgb = _Rgb14Layered(decs[9]) if has_rgb else None
    nir = _Nir14Layered(decs[10]) if has_nir else None
    byt = _Byte14Layered(decs[11:11 + eb]) if eb else None

    count = n_pts
    xs = np.empty(count, dtype="<i4")
    ys = np.empty(count, dtype="<i4")
    zs = np.empty(count, dtype="<i4")
    inten = np.empty(count, dtype="<u2")
    returns = np.empty(count, dtype="u1")
    flags = np.empty(count, dtype="u1")
    cls = np.empty(count, dtype="u1")
    user = np.empty(count, dtype="u1")
    sa = np.empty(count, dtype="<i2")
    psid = np.empty(count, dtype="<u2")
    gps = np.empty(count, dtype="<u8")
    red = np.empty(count, dtype="<u2") if has_rgb else None
    grn = np.empty(count, dtype="<u2") if has_rgb else None
    blu = np.empty(count, dtype="<u2") if has_rgb else None
    nirv = np.empty(count, dtype="<u2") if has_nir else None
    ebs = np.empty((count, eb), dtype="u1") if eb else None

    # first point, raw
    (xs[0], ys[0], zs[0], inten[0], returns[0], flags[0], cls[0],
     user[0], sa[0], psid[0]) = struct.unpack_from(
        "<iiiHBBBBhH", p14_raw, 0)
    (gps[0],) = struct.unpack_from("<Q", p14_raw, 22)
    sc0 = p14.first(p14_raw)
    if has_rgb:
        red[0], grn[0], blu[0] = rgb.first(rgb_raw, sc0)
    if has_nir:
        nirv[0] = nir.first(nir_raw, sc0)
    if eb:
        ebs[0] = np.frombuffer(byt.first(eb_raw, sc0), dtype="u1")

    for i in range(1, count):
        (xs[i], ys[i], zs[i], inten[i], returns[i], flags[i],
         cls[i], user[i], sa[i], psid[i], gps[i],
         chan) = p14.next()
        if has_rgb:
            red[i], grn[i], blu[i] = rgb.next(chan)
        if has_nir:
            nirv[i] = nir.next(chan)
        if eb:
            ebs[i] = np.frombuffer(byt.next(chan), dtype="u1")

    from pdal_spark.sources.las import _record_dtype

    rec = np.zeros(count, dtype=_record_dtype(fmt, point_size))
    rec["X"] = xs
    rec["Y"] = ys
    rec["Z"] = zs
    rec["Intensity"] = inten
    rec["returns"] = returns
    rec["flags"] = flags
    rec["cls"] = cls
    rec["user"] = user
    rec["scan_angle"] = sa
    rec["psid"] = psid
    rec["gps"] = gps.view("<f8")
    if has_rgb:
        rec["red"] = red
        rec["green"] = grn
        rec["blue"] = blu
    if has_nir:
        rec["nir"] = nirv
    if eb:
        # place decoded extra bytes into the record's trailing
        # region (the dtype's itemsize covers them) so writers and
        # the byte-identity round-trip see the full point
        base = rec.dtype.itemsize - eb
        rec.view("u1").reshape(count, rec.dtype.itemsize)[
            :, base:base + eb] = ebs
    return rec
