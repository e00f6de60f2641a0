"""Pure-Python LASzip (.laz) COMPRESSOR — the mirror of
sources.lazdec: point formats 0-3, compressor 2 (pointwise-chunked),
item versions 2 (POINT10/GPSTIME11/RGB12/BYTE v2).

Same derivation basis as the decoder (published LAZ spec + Said's
FastAC; parity studied against the reference's vendored lazperf
encoder.hpp / compressor.hpp / detail/field_*.cpp compress sides —
behavior, not code). Validation: every compressed stream is decoded
back with `sources.lazdec` — which is itself proven point-for-point
against laszip/liblas-produced fixtures the repo did not generate —
so a stream this encoder emits and that decoder accepts is a valid
LASzip stream by the only arbiter available here, and the tests
round-trip real reference point data (basefile, autzen_trim)
through encode -> decode -> exact equality.
"""

from __future__ import annotations

import struct

import numpy as np

from pdal_spark.sources.lazdec import (
    _AC_MAX_LENGTH,
    _AC_MIN_LENGTH,
    _BM_LENGTH_SHIFT,
    _DM_LENGTH_SHIFT,
    _GT_MULTI,
    _GT_MULTI_CODE_FULL,
    _GT_MULTI_MINUS,
    _GT_MULTI_TOTAL,
    _GT_MULTI_UNCHANGED,
    _NUMBER_RETURN_LEVEL,
    _NUMBER_RETURN_MAP,
    _U32,
    _BitModel,
    _Median5,
    _SymModel,
    _c_div2,
    _clamp_u8,
    _i32,
    _i64,
)

_DEFAULT_CHUNK = 50000


class _Encoder:
    """FastAC arithmetic encoder writing into a bytearray (the C
    ring buffer exists for streaming; with the whole chunk in memory
    carry propagation walks the tail directly)."""

    __slots__ = ("out", "base", "length")

    def __init__(self):
        self.out = bytearray()
        self.base = 0
        self.length = _AC_MAX_LENGTH

    def _carry(self):
        out = self.out
        i = len(out) - 1
        while out[i] == 0xFF:
            out[i] = 0
            i -= 1
        out[i] += 1

    def _renorm(self):
        out = self.out
        while True:
            out.append((self.base >> 24) & 0xFF)
            self.base = (self.base << 8) & _U32
            self.length = (self.length << 8) & _U32
            if self.length >= _AC_MIN_LENGTH:
                break

    def encode_bit(self, m: _BitModel, sym: int):
        x = m.bit_0_prob * (self.length >> _BM_LENGTH_SHIFT)
        if sym == 0:
            self.length = x
            m.bit_0_count += 1
        else:
            init = self.base
            self.base = (self.base + x) & _U32
            self.length -= x
            if init > self.base:
                self._carry()
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        m.bits_until_update -= 1
        if m.bits_until_update == 0:
            m.update()

    def encode_symbol(self, m: _SymModel, sym: int):
        init = self.base
        if sym == m.last_symbol:
            x = m.distribution[sym] * (self.length >> _DM_LENGTH_SHIFT)
            self.base = (self.base + x) & _U32
            self.length -= x
        else:
            self.length >>= _DM_LENGTH_SHIFT
            x = m.distribution[sym] * self.length
            self.base = (self.base + x) & _U32
            self.length = m.distribution[sym + 1] * self.length - x
        if init > self.base:
            self._carry()
        if self.length < _AC_MIN_LENGTH:
            self._renorm()
        m.symbol_count[sym] += 1
        m.symbols_until_update -= 1
        if m.symbols_until_update == 0:
            m.update()

    def write_bits(self, bits: int, sym: int):
        if bits > 19:
            self.write_short(sym & 0xFFFF)
            sym >>= 16
            bits -= 16
        init = self.base
        self.length >>= bits
        self.base = (self.base + sym * self.length) & _U32
        if init > self.base:
            self._carry()
        if self.length < _AC_MIN_LENGTH:
            self._renorm()

    def write_short(self, sym: int):
        init = self.base
        self.length >>= 16
        self.base = (self.base + sym * self.length) & _U32
        if init > self.base:
            self._carry()
        if self.length < _AC_MIN_LENGTH:
            self._renorm()

    def write_int(self, v: int):
        self.write_short(v & 0xFFFF)
        self.write_short((v >> 16) & 0xFFFF)

    def done(self) -> bytes:
        init = self.base
        if self.length > 2 * _AC_MIN_LENGTH:
            self.base = (self.base + _AC_MIN_LENGTH) & _U32
            self.length = _AC_MIN_LENGTH >> 1
            another = True
        else:
            self.base = (self.base + (_AC_MIN_LENGTH >> 1)) & _U32
            self.length = _AC_MIN_LENGTH >> 9
            another = False
        if init > self.base:
            self._carry()
        self._renorm()
        self.out.append(0)
        self.out.append(0)
        if another:
            self.out.append(0)
        return bytes(self.out)


class _IntCompressor:
    """compressors::integer — k-interval corrector encoding (shares
    the model layout with the decompressor)."""

    __slots__ = ("bits", "contexts", "bits_high", "corr_bits",
                 "corr_range", "corr_min", "corr_max", "k", "m_bits",
                 "m_corrector0", "m_corrector")

    def __init__(self, bits: int = 16, contexts: int = 1,
                 bits_high: int = 8):
        self.bits = bits
        self.contexts = contexts
        self.bits_high = bits_high
        if bits and bits < 32:
            self.corr_bits = bits
            self.corr_range = 1 << bits
            self.corr_min = -(self.corr_range // 2)
            self.corr_max = self.corr_min + self.corr_range - 1
        else:
            self.corr_bits = 32
            self.corr_range = 0
            self.corr_min = -0x80000000
            self.corr_max = 0x7FFFFFFF
        self.k = 0
        # lazy models — mirrors the decode side (decode-identical;
        # see lazdec._IntDecompressor)
        self.m_bits = [None] * contexts
        self.m_corrector0 = _BitModel()
        self.m_corrector = [None] * self.corr_bits

    def _mbits(self, context: int) -> _SymModel:
        m = self.m_bits[context]
        if m is None:
            m = self.m_bits[context] = _SymModel(self.corr_bits + 1)
        return m

    def _corr(self, k: int) -> _SymModel:
        m = self.m_corrector[k - 1]
        if m is None:
            v = (1 << k) if k <= self.bits_high \
                else (1 << self.bits_high)
            m = self.m_corrector[k - 1] = _SymModel(v)
        return m

    def compress(self, enc: _Encoder, pred: int, real: int,
                 context: int):
        corr = real - pred
        if self.corr_range:
            if corr < self.corr_min:
                corr += self.corr_range
            elif corr > self.corr_max:
                corr -= self.corr_range
        else:
            corr = _i32(corr)
        self._write_corrector(enc, corr, self._mbits(context))

    def _write_corrector(self, enc: _Encoder, c: int,
                         m_bits: _SymModel):
        c1 = -c if c <= 0 else c - 1
        k = 0
        while c1:
            c1 >>= 1
            k += 1
        self.k = k
        enc.encode_symbol(m_bits, k)
        if k:
            if k == 32:
                return
            if c < 0:
                c += (1 << k) - 1
            else:
                c -= 1
            if k <= self.bits_high:
                enc.encode_symbol(self._corr(k), c)
            else:
                k1 = k - self.bits_high
                low = c & ((1 << k1) - 1)
                hi = c >> k1
                enc.encode_symbol(self._corr(k), hi)
                enc.write_bits(k1, low)
        else:
            enc.encode_bit(self.m_corrector0, c)


class _Point10C:
    def __init__(self, enc: _Encoder):
        self.enc = enc
        self.m_changed = _SymModel(64)
        self.m_bit_byte = [None] * 256
        self.m_classification = [None] * 256
        self.m_user_data = [None] * 256
        self.m_sar = [_SymModel(256), _SymModel(256)]
        self.ic_intensity = _IntCompressor(16, 4)
        self.ic_psid = _IntCompressor(16, 1)
        self.ic_dx = _IntCompressor(32, 2)
        self.ic_dy = _IntCompressor(32, 22)
        self.ic_z = _IntCompressor(32, 20)
        self.last_intensity = [0] * 16
        self.last_height = [0] * 8
        self.med_dx = [_Median5() for _ in range(16)]
        self.med_dy = [_Median5() for _ in range(16)]
        self.x = self.y = self.z = 0
        self.intensity = 0
        self.flags = 0
        self.classification = 0
        self.sar = 0
        self.user = 0
        self.psid = 0

    def first(self, raw: bytes):
        (self.x, self.y, self.z, _inten, self.flags,
         self.classification, self.sar, self.user,
         self.psid) = struct.unpack("<iiiHBBBBH", raw)
        self.intensity = 0  # mirror of the decoder's context seed

    def next(self, pt):
        enc = self.enc
        x, y, z, inten, flags, cls, sar, user, psid = pt
        r = flags & 7
        n = (flags >> 3) & 7
        m_ctx = _NUMBER_RETURN_MAP[n][r]
        l_ctx = _NUMBER_RETURN_LEVEL[n][r]
        changed = (
            ((1 if flags != self.flags else 0) << 5)
            | ((1 if inten != self.last_intensity[m_ctx] else 0) << 4)
            | ((1 if cls != self.classification else 0) << 3)
            | ((1 if sar != self.sar else 0) << 2)
            | ((1 if user != self.user else 0) << 1)
            | (1 if psid != self.psid else 0)
        )
        enc.encode_symbol(self.m_changed, changed)
        if changed & 0x20:
            b = self.flags
            m = self.m_bit_byte[b]
            if m is None:
                m = self.m_bit_byte[b] = _SymModel(256)
            enc.encode_symbol(m, flags)
            self.flags = flags
        if changed & 0x10:
            self.ic_intensity.compress(
                enc, self.last_intensity[m_ctx], inten,
                m_ctx if m_ctx < 3 else 3)
            self.last_intensity[m_ctx] = inten
        self.intensity = inten
        if changed & 0x08:
            c0 = self.classification
            m = self.m_classification[c0]
            if m is None:
                m = self.m_classification[c0] = _SymModel(256)
            enc.encode_symbol(m, cls)
            self.classification = cls
        if changed & 0x04:
            sd = (flags >> 6) & 1
            enc.encode_symbol(self.m_sar[sd], (sar - self.sar) & 0xFF)
            self.sar = sar
        if changed & 0x02:
            u0 = self.user
            m = self.m_user_data[u0]
            if m is None:
                m = self.m_user_data[u0] = _SymModel(256)
            enc.encode_symbol(m, user)
            self.user = user
        if changed & 0x01:
            self.ic_psid.compress(enc, self.psid, psid, 0)
            self.psid = psid

        med = self.med_dx[m_ctx].get()
        diff = _i32(x - self.x)
        self.ic_dx.compress(enc, med, diff, 1 if n == 1 else 0)
        self.med_dx[m_ctx].add(diff)
        self.x = x

        k_bits = self.ic_dx.k
        med = self.med_dy[m_ctx].get()
        diff = _i32(y - self.y)
        ctx = (1 if n == 1 else 0) + (
            (k_bits & ~1) if k_bits < 20 else 20)
        self.ic_dy.compress(enc, med, diff, ctx)
        self.med_dy[m_ctx].add(diff)
        self.y = y

        k_bits = (self.ic_dx.k + self.ic_dy.k) // 2
        ctx = (1 if n == 1 else 0) + (
            (k_bits & ~1) if k_bits < 18 else 18)
        self.ic_z.compress(enc, self.last_height[l_ctx], z, ctx)
        self.last_height[l_ctx] = z
        self.z = z


class _GpstimeC:
    def __init__(self, enc: _Encoder):
        self.enc = enc
        self.m_multi = _SymModel(_GT_MULTI_TOTAL)
        self.m_0diff = _SymModel(6)
        self.ic = _IntCompressor(32, 9)
        self.last = 0
        self.next_seq = 0
        self.last_gpstime = [0, 0, 0, 0]
        self.last_diff = [0, 0, 0, 0]
        self.extreme = [0, 0, 0, 0]

    def first(self, raw: bytes):
        (v,) = struct.unpack("<q", raw)
        self.last_gpstime[0] = v

    def next(self, value: int):
        enc = self.enc
        L = self.last
        if self.last_diff[L] == 0:
            if value == self.last_gpstime[L]:
                enc.encode_symbol(self.m_0diff, 0)
                return
            d64 = value - self.last_gpstime[L]
            d32 = _i32(d64)
            if d64 == d32:
                enc.encode_symbol(self.m_0diff, 1)
                self.ic.compress(enc, 0, d32, 0)
                self.last_diff[L] = d32
                self.extreme[L] = 0
            else:
                for i in range(1, 4):
                    o64 = value - self.last_gpstime[(L + i) & 3]
                    if o64 == _i32(o64):
                        enc.encode_symbol(self.m_0diff, i + 2)
                        self.last = (L + i) & 3
                        return self.next(value)
                enc.encode_symbol(self.m_0diff, 2)
                self.ic.compress(
                    enc, _i32(self.last_gpstime[L] >> 32),
                    _i32(value >> 32), 8)
                enc.write_int(value & _U32)
                self.next_seq = (self.next_seq + 1) & 3
                self.last = self.next_seq
                self.last_diff[self.last] = 0
                self.extreme[self.last] = 0
            self.last_gpstime[self.last] = value
        else:
            if value == self.last_gpstime[L]:
                enc.encode_symbol(self.m_multi, _GT_MULTI_UNCHANGED)
                return
            d64 = value - self.last_gpstime[L]
            d32 = _i32(d64)
            if d64 == d32:
                # C: (float)curr / (float)last then std::round
                # (half away from zero) — float32 division
                multi_f = float(np.float32(d32)
                                / np.float32(self.last_diff[L]))
                import math as _m
                multi = (int(_m.floor(multi_f + 0.5))
                         if multi_f >= 0
                         else int(_m.ceil(multi_f - 0.5)))
                if multi == 1:
                    enc.encode_symbol(self.m_multi, 1)
                    self.ic.compress(enc, self.last_diff[L], d32, 1)
                    self.extreme[L] = 0
                elif multi > 0:
                    if multi < _GT_MULTI:
                        enc.encode_symbol(self.m_multi, multi)
                        ctx = 2 if multi < 10 else 3
                        self.ic.compress(
                            enc, _i32(multi * self.last_diff[L]),
                            d32, ctx)
                    else:
                        enc.encode_symbol(self.m_multi, _GT_MULTI)
                        self.ic.compress(
                            enc,
                            _i32(_GT_MULTI * self.last_diff[L]),
                            d32, 4)
                        self.extreme[L] += 1
                        if self.extreme[L] > 3:
                            self.last_diff[L] = d32
                            self.extreme[L] = 0
                elif multi < 0:
                    if multi > _GT_MULTI_MINUS:
                        enc.encode_symbol(
                            self.m_multi, _GT_MULTI - multi)
                        self.ic.compress(
                            enc, _i32(multi * self.last_diff[L]),
                            d32, 5)
                    else:
                        enc.encode_symbol(
                            self.m_multi,
                            _GT_MULTI - _GT_MULTI_MINUS)
                        self.ic.compress(
                            enc,
                            _i32(_GT_MULTI_MINUS
                                 * self.last_diff[L]),
                            d32, 6)
                        self.extreme[L] += 1
                        if self.extreme[L] > 3:
                            self.last_diff[L] = d32
                            self.extreme[L] = 0
                else:
                    enc.encode_symbol(self.m_multi, 0)
                    self.ic.compress(enc, 0, d32, 7)
                    self.extreme[L] += 1
                    if self.extreme[L] > 3:
                        self.last_diff[L] = d32
                        self.extreme[L] = 0
            else:
                for i in range(1, 4):
                    o64 = value - self.last_gpstime[(L + i) & 3]
                    if o64 == _i32(o64):
                        enc.encode_symbol(
                            self.m_multi, _GT_MULTI_CODE_FULL + i)
                        self.last = (L + i) & 3
                        return self.next(value)
                enc.encode_symbol(self.m_multi, _GT_MULTI_CODE_FULL)
                self.ic.compress(
                    enc, _i32(self.last_gpstime[L] >> 32),
                    _i32(value >> 32), 8)
                enc.write_int(value & _U32)
                self.next_seq = (self.next_seq + 1) & 3
                self.last = self.next_seq
                self.last_diff[self.last] = 0
                self.extreme[self.last] = 0
            self.last_gpstime[self.last] = value


class _RgbC:
    def __init__(self, enc: _Encoder):
        self.enc = enc
        self.m_byte_used = _SymModel(128)
        self.m_diff = [_SymModel(256) for _ in range(6)]
        self.r = self.g = self.b = 0

    def first(self, raw: bytes):
        self.r, self.g, self.b = struct.unpack("<HHH", raw)

    def next(self, rgb):
        enc = self.enc
        r, g, b = rgb
        lr, lg, lb = self.r, self.g, self.b

        def dh(x, y, f):
            return 1 if ((x ^ y) & f) != 0 else 0

        sym = (
            dh(lr, r, 0x00FF)
            | (dh(lr, r, 0xFF00) << 1)
            | (dh(lg, g, 0x00FF) << 2)
            | (dh(lg, g, 0xFF00) << 3)
            | (dh(lb, b, 0x00FF) << 4)
            | (dh(lb, b, 0xFF00) << 5)
            | ((1 if (dh(r, g, 0x00FF) or dh(r, b, 0x00FF)
                      or dh(r, g, 0xFF00) or dh(r, b, 0xFF00))
                else 0) << 6)
        )
        enc.encode_symbol(self.m_byte_used, sym)
        diff_l = 0
        diff_h = 0
        if sym & 1:
            diff_l = (r & 0xFF) - (lr & 0xFF)
            enc.encode_symbol(self.m_diff[0], diff_l & 0xFF)
        if sym & 2:
            diff_h = (r >> 8) - (lr >> 8)
            enc.encode_symbol(self.m_diff[1], diff_h & 0xFF)
        if sym & 0x40:
            if sym & 4:
                corr = (g & 0xFF) - _clamp_u8(diff_l + (lg & 0xFF))
                enc.encode_symbol(self.m_diff[2], corr & 0xFF)
            if sym & 0x10:
                diff_l = _c_div2(diff_l + (g & 0xFF) - (lg & 0xFF))
                corr = (b & 0xFF) - _clamp_u8(diff_l + (lb & 0xFF))
                enc.encode_symbol(self.m_diff[4], corr & 0xFF)
            if sym & 8:
                corr = (g >> 8) - _clamp_u8(diff_h + (lg >> 8))
                enc.encode_symbol(self.m_diff[3], corr & 0xFF)
            if sym & 0x20:
                diff_h = _c_div2(diff_h + (g >> 8) - (lg >> 8))
                corr = (b >> 8) - _clamp_u8(diff_h + (lb >> 8))
                enc.encode_symbol(self.m_diff[5], corr & 0xFF)
        self.r, self.g, self.b = r, g, b


class _BytesC:
    def __init__(self, enc: _Encoder, count: int):
        self.enc = enc
        self.count = count
        self.models = [_SymModel(256) for _ in range(count)]
        self.lasts = [0] * count

    def first(self, raw: bytes):
        self.lasts = list(raw)

    def next(self, raw: bytes):
        for i in range(self.count):
            self.enc.encode_symbol(
                self.models[i], (raw[i] - self.lasts[i]) & 0xFF)
            self.lasts[i] = raw[i]


def _laszip_vlr(fmt: int, eb: int, chunk_size: int) -> bytes:
    items = [(6, 20, 2)]  # POINT10 v2
    if fmt in (1, 3):
        items.append((7, 8, 2))   # GPSTIME11 v2
    if fmt in (2, 3):
        items.append((8, 6, 2))   # RGB12 v2
    if eb:
        items.append((0, eb, 2))  # BYTE v2
    payload = struct.pack(
        "<HHBBHIIqqH", 2, 0, 2, 2, 0, 0, chunk_size, -1, -1,
        len(items))
    for t, sz, ver in items:
        payload += struct.pack("<HHH", t, sz, ver)
    return struct.pack(
        "<H16sHH32s", 0, b"laszip encoded", 22204, len(payload),
        b"pdal_spark lazenc") + payload


def compress_las_bytes(las: bytes,
                       chunk_size: int = _DEFAULT_CHUNK) -> bytes:
    """Uncompressed .las byte blob -> its .laz twin (compressor 2,
    v2 items). Raises for point formats outside 0-3."""
    from pdal_spark.sources.las import _parse_las_header, _record_dtype

    hdr = _parse_las_header(las)
    fmt = hdr["fmt"]
    if fmt > 3:
        raise ValueError(
            f"lazenc: point format {fmt} needs the layered "
            "compressor 3 (not implemented; formats 0-3 only)")
    count = hdr["count"]
    eb = hdr["eb"]
    size = hdr["size"]
    rec = np.frombuffer(las, dtype=_record_dtype(fmt, size),
                        count=count, offset=hdr["off"])
    has_time = fmt in (1, 3)
    has_color = fmt in (2, 3)
    raw = np.frombuffer(las, dtype="u1",
                        count=count * size, offset=hdr["off"])
    raw = raw.reshape(count, size)

    xs = rec["X"].astype(np.int64)
    ys = rec["Y"].astype(np.int64)
    zs = rec["Z"].astype(np.int64)
    inten = rec["Intensity"].astype(np.int64)
    flags = rec["flags"].astype(np.int64)
    cls = rec["cls"].astype(np.int64)
    sar = np.ascontiguousarray(rec["scan_angle"]).view("u1")
    user = rec["user"].astype(np.int64)
    psid = rec["psid"].astype(np.int64)
    gps_bits = (np.ascontiguousarray(rec["gps"]).view("<i8")
                if has_time else None)

    from pdal_spark.native import lazenc10_native

    native = lazenc10_native()

    chunks_out: list[bytes] = []
    i = 0
    while i < count:
        n_pts = min(chunk_size, count - i)
        if native is not None:
            # C kernel (byte-identity with the Python body pinned
            # in tests/test_native_lazdec14.py)
            blob = native(
                np.ascontiguousarray(raw[i:i + n_pts]).tobytes(),
                n_pts, fmt, eb, size)
            chunks_out.append(blob)
            i += n_pts
            continue
        enc = _Encoder()
        head = bytearray()
        p10 = _Point10C(enc)
        gt = _GpstimeC(enc) if has_time else None
        rgb = _RgbC(enc) if has_color else None
        byt = _BytesC(enc, eb) if eb else None
        for j in range(n_pts):
            idx = i + j
            if j == 0:
                b20 = bytes(raw[idx, :20])
                head += b20
                p10.first(b20)
                off = 20
                if gt is not None:
                    b8 = bytes(raw[idx, off:off + 8])
                    head += b8
                    gt.first(b8)
                    off += 8
                if rgb is not None:
                    b6 = bytes(raw[idx, off:off + 6])
                    head += b6
                    rgb.first(b6)
                    off += 6
                if byt is not None:
                    bb = bytes(raw[idx, off:off + eb])
                    head += bb
                    byt.first(bb)
            else:
                p10.next((int(xs[idx]), int(ys[idx]), int(zs[idx]),
                          int(inten[idx]), int(flags[idx]),
                          int(cls[idx]), int(sar[idx]),
                          int(user[idx]), int(psid[idx])))
                if gt is not None:
                    gt.next(int(gps_bits[idx]))
                if rgb is not None:
                    rgb.next((int(rec["red"][idx]),
                              int(rec["green"][idx]),
                              int(rec["blue"][idx])))
                if byt is not None:
                    byt.next(bytes(raw[idx, size - eb:size]))
        chunks_out.append(bytes(head) + enc.done())
        i += n_pts

    # header: set compression bit, add the laszip VLR, move points
    vlr = _laszip_vlr(fmt, eb, chunk_size)
    (hdr_size,) = struct.unpack_from("<H", las, 94)
    (point_off, vlr_count) = struct.unpack_from("<II", las, 96)
    head_bytes = bytearray(las[:hdr_size])
    head_bytes[104] |= 0x80
    between = las[hdr_size:point_off]  # existing VLRs stay in place
    # the header's point_offset points AT the 8-byte chunk-table-
    # offset slot; the first chunk follows it (firstChunkOffset =
    # point_offset + 8)
    new_point_off = hdr_size + len(vlr) + len(between)
    struct.pack_into("<II", head_bytes, 96, new_point_off,
                     vlr_count + 1)

    body = b"".join(chunks_out)
    chunk_table_off = new_point_off + 8 + len(body)

    # chunk table: u32 version 0, u32 count, then arithmetic-coded
    # per-chunk byte sizes (prediction = previous size, context 1)
    enc2 = _Encoder()
    ic2 = _IntCompressor(32, 2)
    prev = 0
    for ch in chunks_out:
        ic2.compress(enc2, prev, len(ch), 1)
        prev = len(ch)
    table = (struct.pack("<II", 0, len(chunks_out)) + enc2.done())

    # the laszip VLR goes FIRST in the VLR block (directly after
    # the header — `between` may hold original VLRs plus padding,
    # and VLRs must be contiguous from header_size)
    return (bytes(head_bytes) + vlr + between
            + struct.pack("<q", chunk_table_off) + body + table)
