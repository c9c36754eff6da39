"""Baseline JPEG codec from scratch (public spec: ITU-T T.81 / ISO
10918-1), stdlib + numpy only — no codec library ships in this
container.

Decoder (`decode_jpeg`): baseline sequential DCT (SOF0/1) AND
progressive DCT (SOF2 — spectral selection x successive approximation,
T.81 Annex G: DC first/refine, AC first with EOBn runs, AC refinement
with correction bits), 8-bit, 1 or 3 components, arbitrary sampling
factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart markers, 0xFF00
byte stuffing. Huffman tables are built FROM THE FILE'S OWN DHT
segments (spec-driven — decoding a real-world JPEG validates the
marker walk, canonical-code construction, MCU layout, scan scripts,
dequant, IDCT and color convert against the public format, independent
of this module's encoder constants). Arithmetic coding, hierarchical /
lossless modes, 12-bit precision and 16-bit quant tables raise —
honest gaps, not misdecodes.

Encoder (`encode_jpeg`): gray or RGB 4:4:4 with the Annex K standard
quantization + huffman tables, quality scaling per the public IJG
formula; `progressive=True` emits a spectral-selection +
DC-successive-approximation scan script carrying the SAME quantized
coefficients as the baseline stream, so progressive decode must
pixel-match baseline decode exactly (pinned by test). JPEG is lossy,
so round-trip-to-pixels assertions are PSNR bounds, not equality.

The baseline entropy hot loop is per-SYMBOL, not per-bit: restart
segments are pre-unstuffed in one vectorized pass (_split_entropy), an
extended 2^16 LUT resolves huffman code + magnitude bits + EXTEND in a
single native-int index for the common case, the bit accumulator
refills 48 bits at a time, and coefficients scatter into the numpy
store once per scan. Still Python — the honest swap-in point for a
native path in production (the Spark side only ever calls this inside
Arrow-batched fail-soft stages).
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 quantization tables (natural order after de-zigzag)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 standard huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II basis: dct = D @ block @ D.T
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


# -------------------------------------------------------- huffman tables


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical huffman (T.81 Annex C): {(length, code) -> symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_decode_lut(bits: list[int], vals: list[int]) -> list[int]:
    """Flat 2^16 lookup table: entry[peeked 16 bits] = (code_length <<
    8) | symbol, 0 = invalid prefix. One index replaces the bit-by-bit
    tree walk (the classic fast-huffman construction: every 16-bit word
    starting with an L-bit code maps to that code). Returned as a plain
    Python list — the entropy loop indexes it with native ints, avoiding
    a numpy scalar box per symbol."""
    lut = np.zeros(1 << 16, dtype=np.int32)
    for (length, code), sym in _build_decode_table(bits, vals).items():
        start = code << (16 - length)
        lut[start : start + (1 << (16 - length))] = (length << 8) | sym
    return lut.tolist()


def _build_fast_lut(bits: list[int], vals: list[int], dc: bool) -> list[int]:
    """Extended 2^16 LUT for the baseline hot loop: when the huffman
    code AND its magnitude bits fit the 16-bit peek (the overwhelmingly
    common case), one lookup yields the fully EXTENDed coefficient —
    entry = (total_bits << 21) | (run << 17) | (value + 65536). A zero
    value field marks EOB/ZRL (AC codes with size 0); negative entries
    -((code_len << 8) | symbol) defer rare too-long code+magnitude pairs
    to a slow path; 0 = invalid prefix. Construction is vectorized per
    code (one arange over the entry span)."""
    lut = np.zeros(1 << 16, dtype=np.int64)
    for (ln, code), sym in _build_decode_table(bits, vals).items():
        start = code << (16 - ln)
        width = 1 << (16 - ln)
        t = sym if dc else sym & 0xF
        r = 0 if dc else sym >> 4
        if t == 0:
            entry = (ln << 21) | (65536 if dc else r << 17)
            lut[start : start + width] = entry
        elif ln + t <= 16:
            mag = (np.arange(width, dtype=np.int64) >> (16 - ln - t)) & (
                (1 << t) - 1
            )
            val = np.where(mag >= 1 << (t - 1), mag, mag - (1 << t) + 1)
            lut[start : start + width] = (
                ((ln + t) << 21) | (r << 17) | (val + 65536)
            )
        else:
            lut[start : start + width] = -((ln << 8) | sym)
    return lut.tolist()


_LUT_CACHE: dict[tuple, list[int]] = {}


class _HuffTable:
    """One DHT table, with its decode LUTs built lazily: the baseline
    hot path wants the extended coefficient LUT, the progressive
    decoders the (length, symbol) one — a file only pays for the
    variants its scans actually use. LUTs are cached module-wide keyed
    by the table spec: a corpus of images sharing the standard Annex K
    tables (the overwhelmingly common case) builds each 2^16 LUT once
    per executor, not once per image."""

    __slots__ = ("bits", "vals", "_key")

    def __init__(self, bits: list[int], vals: list[int]):
        self.bits = bits
        self.vals = vals
        self._key = (bytes(bits), bytes(vals))

    def plain(self) -> list[int]:
        k = (*self._key, "plain")
        lut = _LUT_CACHE.get(k)
        if lut is None:
            if len(_LUT_CACHE) >= 64:  # bound memory under adversarial DHTs
                _LUT_CACHE.clear()
            lut = _LUT_CACHE[k] = _build_decode_lut(self.bits, self.vals)
        return lut

    def fast(self, dc: bool) -> list[int]:
        k = (*self._key, dc)
        lut = _LUT_CACHE.get(k)
        if lut is None:
            if len(_LUT_CACHE) >= 64:
                _LUT_CACHE.clear()
            lut = _LUT_CACHE[k] = _build_fast_lut(self.bits, self.vals, dc)
        return lut


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol -> (code, length)} from the same canonical construction."""
    return {v: (c, l) for (l, c), v in _build_decode_table(bits, vals).items()}


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ------------------------------------------------------- entropy segments

_MSK = [(1 << i) - 1 for i in range(80)]


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Slice the entropy-coded stream starting at ``pos`` into restart
    segments with 0xFF00 byte stuffing removed — one vectorized numpy
    pass over the 0xFF positions instead of a per-byte python check in
    the bit reader (the r4 per-bit-loop hotspot). Returns (segments,
    end_pos): end_pos is the offset of the 0xFF opening the first
    non-RST marker (or len(data) when the stream just ends)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    ffs = (np.nonzero(arr[pos:] == 0xFF)[0] + pos).tolist()
    segments: list[bytes] = []
    cuts: list[int] = []  # positions of stuffed 0x00 bytes in the segment
    seg_start = pos
    end_pos = len(data)

    def cut(a: int, b: int) -> bytes:
        if not cuts:
            return data[a:b]
        keep = np.ones(b - a, dtype=bool)
        keep[np.asarray(cuts, dtype=np.int64) - a] = False
        return arr[a:b][keep].tobytes()

    for f in ffs:
        nxt = data[f + 1] if f + 1 < len(data) else 0xD9
        if nxt == 0x00:
            cuts.append(f + 1)
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(cut(seg_start, f))
            cuts.clear()
            seg_start = f + 2
        else:
            end_pos = f
            break
    segments.append(cut(seg_start, min(end_pos, len(data))))
    return segments, end_pos


class _SegReader:
    """Bit reader over one pre-unstuffed restart segment (stuffing and
    markers already removed by _split_entropy). Peeks pad with 1-bits —
    T.81's padding convention — but consuming past the real data raises,
    so truncation is still loud. Used by the progressive scan decoders;
    the baseline hot path inlines the same accumulator logic."""

    __slots__ = ("seg", "L", "acc", "nb", "bp", "pad")

    def __init__(self, seg: bytes):
        self.seg = seg
        self.L = len(seg)
        self.acc = 0
        self.nb = 0
        self.bp = 0
        self.pad = 0

    def _refill(self, want: int) -> None:
        seg = self.seg
        while self.nb < want:
            if self.bp < self.L:
                self.acc = (self.acc << 8) | seg[self.bp]
                self.bp += 1
            else:
                self.acc = (self.acc << 8) | 0xFF
                self.pad += 8
            self.nb += 8

    def read_bits(self, count: int) -> int:
        if count == 0:
            return 0
        if self.nb < count:
            self._refill(count)
        if count > self.nb - self.pad:
            raise ValueError("entropy data exhausted mid-symbol")
        self.nb -= count
        v = (self.acc >> self.nb) & _MSK[count]
        self.acc &= _MSK[self.nb]
        return v

    def huff(self, lut: list[int]) -> int:
        if self.nb < 16:
            self._refill(16)
        entry = lut[(self.acc >> (self.nb - 16)) & 0xFFFF]
        if entry == 0:
            raise ValueError("invalid huffman code in entropy data")
        length = entry >> 8
        if length > self.nb - self.pad:
            raise ValueError("entropy data exhausted mid-symbol")
        self.nb -= length
        self.acc &= _MSK[self.nb]
        return entry & 0xFF


# --------------------------------------------------------------- decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JPEG -> uint8 pixel array ([h, w] gray or
    [h, w, 3] RGB). See module docstring for the supported envelope."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, list] = {}
    huff_ac: dict[int, list] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    progressive = False
    restart_interval = 0
    geom = None
    cf: dict[int, np.ndarray] | None = None  # flat zigzag-order coeffs per comp

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                zz = np.frombuffer(body[b + 1 : b + 65], dtype=np.uint8).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                quant[tq] = nat.reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
                b += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG not supported")
            frame = (h, w, comps)
            progressive = marker == 0xC2
            geom = _geometry(frame)
            cf = {
                cid: np.zeros(geom.bh[cid] * geom.bw[cid] * 64, dtype=np.int64)
                for cid, *_ in comps
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline/progressive DCT JPEG supported (SOF marker C{marker & 0xF:X})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tables >> 4, tables & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            segments, pos = _split_entropy(payload, pos + 2 + seg_len)
            if progressive:
                _decode_scan_progressive(
                    segments, frame, geom, scan, huff_dc, huff_ac,
                    restart_interval, cf, ss, se, ah, al,
                )
            else:
                _decode_scan_baseline(
                    segments, frame, geom, scan, huff_dc, huff_ac,
                    restart_interval, cf,
                )
            # tolerate pad bytes between entropy data and the next marker
            while pos + 1 < len(payload) and (
                payload[pos] != 0xFF or payload[pos + 1] == 0x00
            ):
                pos += 1
            continue
        # APPn / COM / others: skip
        pos += 2 + seg_len

    if frame is None or cf is None:
        raise ValueError("JPEG missing SOF/SOS")
    out_planes = _reconstruct(frame, geom, quant, cf)
    h, w, comps = frame
    if len(comps) == 1:
        return out_planes[comps[0][0]][:h, :w].astype(np.uint8)
    hmax, vmax = geom.hmax, geom.vmax
    planes = []
    for cid, hs, vs, _ in comps:
        p = out_planes[cid]
        # nearest-neighbour upsample to full resolution (T.81 leaves
        # the filter to the decoder; box replication is the common one)
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(p[:h, :w].astype(np.float64))
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _Geom:
    """Frame geometry: MCU grid plus each component's MCU-padded block
    array dims (bh x bw). Coefficients are stored per component as a
    flat zigzag-order list indexed (block_y * bw + block_x) * 64 + k, so
    interleaved and non-interleaved scans address the same storage."""

    __slots__ = ("hmax", "vmax", "mcux", "mcuy", "bw", "bh")

    def __init__(self, hmax, vmax, mcux, mcuy, bw, bh):
        self.hmax, self.vmax = hmax, vmax
        self.mcux, self.mcuy = mcux, mcuy
        self.bw, self.bh = bw, bh


def _geometry(frame) -> _Geom:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    bw = {cid: mcux * hs for cid, hs, vs, _ in comps}
    bh = {cid: mcuy * vs for cid, hs, vs, _ in comps}
    return _Geom(hmax, vmax, mcux, mcuy, bw, bh)


def _scan_order(frame, geom: _Geom, scan_cids: list[int]) -> tuple[list, int]:
    """Block traversal for a scan (T.81 A.2): an interleaved scan walks
    MCUs (hs x vs blocks per component); a single-component scan walks
    that component's own ceil(size/8) grid in raster order — NOT the
    MCU-padded grid. Returns (pairs, unit_len): a flat decode-order list
    of (cid, flat_coeff_base) built vectorized (numpy index arithmetic +
    one zip — no per-block python loop), with unit_len blocks per MCU so
    one restart interval spans restart_interval * unit_len pairs."""
    h, w, comps = frame
    by_cid = {cid: (hs, vs) for cid, hs, vs, _ in comps}
    if len(scan_cids) > 1:
        per_comp = []
        cid_unit: list[int] = []
        for cid in scan_cids:
            hs, vs = by_cid[cid]
            bw = geom.bw[cid]
            my = np.arange(geom.mcuy)[:, None, None, None]
            mx = np.arange(geom.mcux)[None, :, None, None]
            by = np.arange(vs)[None, None, :, None]
            bx = np.arange(hs)[None, None, None, :]
            bases = ((my * vs + by) * bw + mx * hs + bx) * 64
            per_comp.append(bases.reshape(geom.mcuy * geom.mcux, vs * hs))
            cid_unit += [cid] * (vs * hs)
        flat = np.concatenate(per_comp, axis=1).reshape(-1).tolist()
        cids = cid_unit * (geom.mcuy * geom.mcux)
        return list(zip(cids, flat)), len(cid_unit)
    cid = scan_cids[0]
    hs, vs = by_cid[cid]
    cw = (-(-w * hs // geom.hmax) + 7) // 8  # ceil(ceil(w*hs/hmax)/8)
    ch = (-(-h * vs // geom.vmax) + 7) // 8
    bases = (
        (np.arange(ch)[:, None] * geom.bw[cid] + np.arange(cw)[None, :]) * 64
    ).reshape(-1).tolist()
    return [(cid, b) for b in bases], 1


def _decode_scan_baseline(segments, frame, geom, scan, huff_dc, huff_ac,
                          restart_interval, cf):
    """Sequential-DCT scan: all 64 coefficients per block. This loop
    decodes every entropy symbol of the image, so per-symbol cost is
    everything: the extended LUT (_build_fast_lut) resolves code +
    magnitude + EXTEND in ONE native-int index for codes whose total
    bits fit the 16-bit peek, the bit accumulator is inlined over the
    pre-unstuffed segment, and coefficients accumulate as sparse
    (index, value) lists scattered into the numpy store once per scan."""
    scan_cids = [cs for cs, _, _ in scan]
    tabs = {}
    for cs, td, ta in scan:
        tabs[cs] = (huff_dc[td].fast(dc=True), huff_ac[ta].fast(dc=False))
    pairs, unit_len = _scan_order(frame, geom, scan_cids)
    n_units = len(pairs) // unit_len
    ri = (restart_interval or n_units) * unit_len
    sinks = {cid: ([], []) for cid in scan_cids}
    for ci, start in enumerate(range(0, len(pairs), ri)):
        seg = segments[ci] if ci < len(segments) else b""
        L = len(seg)
        acc = nb = bp = pad = 0
        pred = dict.fromkeys(scan_cids, 0)
        for cid, base in pairs[start : start + ri]:
            dcl, acl = tabs[cid]
            ilist, vlist = sinks[cid]
            # ---- DC coefficient
            if nb < 16:
                if bp + 6 <= L:  # bulk refill: 48 bits in one call
                    acc = (acc << 48) | int.from_bytes(seg[bp : bp + 6], "big")
                    bp += 6
                    nb += 48
                else:
                    while nb < 48:
                        if bp < L:
                            acc = (acc << 8) | seg[bp]
                            bp += 1
                        else:
                            acc = (acc << 8) | 0xFF
                            pad += 8
                        nb += 8
            e = dcl[acc >> (nb - 16)]
            if e > 0:
                tl = e >> 21
                if tl > nb - pad:
                    raise ValueError("entropy data exhausted mid-symbol")
                nb -= tl
                acc &= _MSK[nb]
                dc = pred[cid] + (e & 0x1FFFF) - 65536
            elif e == 0:
                raise ValueError("invalid huffman code in entropy data")
            else:  # code + magnitude wider than the 16-bit peek
                ln = (-e) >> 8
                t = (-e) & 0xFF
                want = ln + t
                if nb < want:
                    if bp + 6 <= L:
                        acc = (acc << 48) | int.from_bytes(
                            seg[bp : bp + 6], "big"
                        )
                        bp += 6
                        nb += 48
                    else:
                        while nb < want:
                            if bp < L:
                                acc = (acc << 8) | seg[bp]
                                bp += 1
                            else:
                                acc = (acc << 8) | 0xFF
                                pad += 8
                            nb += 8
                if want > nb - pad:
                    raise ValueError("entropy data exhausted mid-symbol")
                nb -= ln
                v = (acc >> (nb - t)) & _MSK[t]
                nb -= t
                acc &= _MSK[nb]
                dc = pred[cid] + (v if v >= 1 << (t - 1) else v - _MSK[t])
            pred[cid] = dc
            ilist.append(base)
            vlist.append(dc)
            # ---- AC coefficients
            k = 1
            while k < 64:
                if nb < 16:
                    if bp + 6 <= L:
                        acc = (acc << 48) | int.from_bytes(
                            seg[bp : bp + 6], "big"
                        )
                        bp += 6
                        nb += 48
                    else:
                        while nb < 48:
                            if bp < L:
                                acc = (acc << 8) | seg[bp]
                                bp += 1
                            else:
                                acc = (acc << 8) | 0xFF
                                pad += 8
                            nb += 8
                e = acl[acc >> (nb - 16)]
                if e > 0:
                    tl = e >> 21
                    if tl > nb - pad:
                        raise ValueError("entropy data exhausted mid-symbol")
                    nb -= tl
                    acc &= _MSK[nb]
                    vp = e & 0x1FFFF
                    if vp:
                        k += (e >> 17) & 0xF
                        if k > 63:
                            raise ValueError("AC run past end of block")
                        ilist.append(base + k)
                        vlist.append(vp - 65536)
                        k += 1
                    elif (e >> 17) & 0xF == 15:  # ZRL: 16 zeros
                        k += 16
                    else:  # EOB
                        break
                elif e == 0:
                    raise ValueError("invalid huffman code in entropy data")
                else:  # slow path: code + magnitude wider than 16 bits
                    ln = (-e) >> 8
                    rs = (-e) & 0xFF
                    s = rs & 0xF
                    want = ln + s
                    if nb < want:
                        if bp + 6 <= L:
                            acc = (acc << 48) | int.from_bytes(
                                seg[bp : bp + 6], "big"
                            )
                            bp += 6
                            nb += 48
                        else:
                            while nb < want:
                                if bp < L:
                                    acc = (acc << 8) | seg[bp]
                                    bp += 1
                                else:
                                    acc = (acc << 8) | 0xFF
                                    pad += 8
                                nb += 8
                    if want > nb - pad:
                        raise ValueError("entropy data exhausted mid-symbol")
                    nb -= ln
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    v = (acc >> (nb - s)) & _MSK[s]
                    nb -= s
                    acc &= _MSK[nb]
                    ilist.append(base + k)
                    vlist.append(v if v >= 1 << (s - 1) else v - _MSK[s])
                    k += 1
    for cid, (ilist, vlist) in sinks.items():
        if ilist:
            cf[cid][np.asarray(ilist, dtype=np.int64)] = vlist


def _decode_scan_progressive(segments, frame, geom, scan, huff_dc, huff_ac,
                             restart_interval, cf, ss, se, ah, al):
    """Progressive-DCT scan dispatch (T.81 G.2): spectral selection
    (Ss..Se) x successive approximation (Ah/Al). DC scans may be
    interleaved; AC scans are single-component by spec. Coefficients
    accumulate across scans in cf; reconstruction happens once at EOI."""
    scan_cids = [cs for cs, _, _ in scan]
    pairs, unit_len = _scan_order(frame, geom, scan_cids)
    ri = (restart_interval or len(pairs)) * unit_len

    def readers():
        for ci, start in enumerate(range(0, len(pairs), ri)):
            yield (
                _SegReader(segments[ci] if ci < len(segments) else b""),
                pairs[start : start + ri],
            )

    # scans mutate coefficients one at a time; numpy SCALAR access is
    # ~10x a list index, so each touched component works on a plain
    # list for the scan's duration and writes back once at the end
    bufs = {cid: cf[cid].tolist() for cid in scan_cids}

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ah == 0:  # first pass: huffman-coded diffs at reduced precision
            tabs = {cs: huff_dc[td].plain() for cs, td, _ in scan}
            for rd, chunk in readers():
                pred = dict.fromkeys(scan_cids, 0)
                for cid, base in chunk:
                    t = rd.huff(tabs[cid])
                    pred[cid] += _extend(rd.read_bits(t), t)
                    bufs[cid][base] = pred[cid] << al
        else:  # refinement: one raw bit per block
            for rd, chunk in readers():
                for cid, base in chunk:
                    if rd.read_bits(1):
                        bufs[cid][base] |= 1 << al
    else:  # AC scan
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        if not 1 <= ss <= se <= 63:
            raise ValueError("invalid progressive spectral band")
        acl = huff_ac[scan[0][2]].plain()
        cfl = bufs[scan_cids[0]]
        if ah == 0:
            _prog_ac_first(readers(), acl, cfl, ss, se, al)
        else:
            _prog_ac_refine(readers(), acl, cfl, ss, se, al)
    for cid in bufs:
        cf[cid][:] = bufs[cid]


def _prog_ac_first(readers, acl, cfl, ss, se, al):
    """First pass for an AC band (T.81 G.2.2): huffman RS symbols with
    EOBn run codes — a run of (1<<r)+appended-bits blocks whose band is
    entirely zero at this precision."""
    for rd, chunk in readers:
        eobrun = 0
        for _, base in chunk:
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = rd.huff(acl)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1 + (rd.read_bits(r) if r else 0)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run past end of band")
                cfl[base + k] = _extend(rd.read_bits(s), s) << al
                k += 1


def _prog_ac_refine(readers, acl, cfl, ss, se, al):
    """Refinement pass for an AC band (T.81 G.2.3 / figure G.7): RS
    symbols position NEWLY nonzero coefficients (s=1, sign bit) among
    zero-history positions, while every nonzero-history coefficient
    passed over contributes one correction bit that grows its magnitude
    by 1<<Al when set. EOB runs carry the remaining correction bits."""
    p1 = 1 << al
    m1 = -1 << al
    for rd, chunk in readers:
        eobrun = 0
        for _, base in chunk:
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = rd.huff(acl)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) + (rd.read_bits(r) if r else 0)
                            break
                        newval = 0  # ZRL: 16 zero-history positions
                    elif s == 1:
                        newval = p1 if rd.read_bits(1) else m1
                    else:
                        raise ValueError(
                            "invalid magnitude in AC refinement scan"
                        )
                    while k <= se:
                        i = base + k
                        v = cfl[i]
                        if v:
                            if rd.read_bits(1) and not v & p1:
                                cfl[i] = v + p1 if v >= 0 else v + m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval:
                        if k > se:
                            raise ValueError("AC run past end of band")
                        cfl[base + k] = newval
                    k += 1
            if eobrun:
                while k <= se:  # correction bits for the rest of the band
                    i = base + k
                    v = cfl[i]
                    if v and rd.read_bits(1) and not v & p1:
                        cfl[i] = v + p1 if v >= 0 else v + m1
                    k += 1
                eobrun -= 1


def _reconstruct(frame, geom: _Geom, quant, cf) -> dict[int, np.ndarray]:
    """All scans decoded: de-zigzag, dequant and IDCT every component.
    The 2-D IDCT (D.T @ X @ D per block) runs as two [n*8, 8] x [8, 8]
    BLAS matmuls over the whole stack — einsum's batched-3D path was
    ~40% of total decode time; the flattened dgemms are ~50x faster."""
    h, w, comps = frame
    out = {}
    for cid, hs, vs, tq in comps:
        zz = np.asarray(cf[cid], dtype=np.float64).reshape(-1, 64)
        nat = np.empty_like(zz)
        nat[:, ZIGZAG] = zz
        stack = nat.reshape(-1, 8, 8) * quant[tq][None, :, :]
        n = stack.shape[0]
        half = (stack.reshape(n * 8, 8) @ _D).reshape(n, 8, 8)  # X @ D
        blocks = (
            (half.transpose(0, 2, 1).reshape(n * 8, 8) @ _D)  # (X@D).T @ D
            .reshape(n, 8, 8)
            .transpose(0, 2, 1)
        )
        by, bx = geom.bh[cid], geom.bw[cid]
        plane = (
            blocks.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        out[cid] = np.clip(np.round(plane + 128.0), 0, 255)
    return out


# --------------------------------------------------------------- encoder


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public formula)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _plane_coeffs(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Block-padded plane -> [n_blocks, 64] quantized zigzag-order
    coefficients in raster block order, computed vectorized (one einsum
    DCT + one rounded divide). Both the baseline and progressive
    writers emit from this same array, so the two streams carry
    identical coefficients by construction."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coeffs = np.einsum("ij,njk,lk->nil", _D, blocks, _D)
    q = np.round(coeffs / qt[None, :, :]).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _encode_block(bw, zz, pred_key, pred, dc_tab, ac_tab) -> None:
    """Sequential (baseline) coding of one block's zigzag coefficients:
    DC diff + run/size AC symbols with ZRL and EOB (T.81 F.1.2)."""
    diff = zz[0] - pred[pred_key]
    pred[pred_key] = zz[0]
    t = _mag_cat(diff)
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _mag_cat(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)


# ------------------------------------------ progressive scan emitters
#
# T.81 Annex G coding, with one simplification: EOB runs are capped at
# 1 (a lone 0x00 EOB per block) because the Annex K standard tables
# carry no EOBn (n>0) symbols — real progressive encoders ship custom
# DHTs for those. The stream stays fully spec-conformant; the EOBn>0
# DECODE path is pinned by real third-party fixtures and a hand-built
# custom-DHT vector test instead.


def _pt_ac(v: int, al: int) -> int:
    """AC point transform (G.1.2.2): magnitude shift, sign preserved."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _emit_dc_first(bw, comp_zzs, order, dc_tabs, al) -> None:
    """Interleaved DC scan, Ah=0: diff-coded (dc >> Al) per component.
    `order` is the interleaved (comp_index, block_index) walk."""
    pred = dict.fromkeys({ci for ci, _ in order}, 0)
    for ci, bi in order:
        dc = int(comp_zzs[ci][bi, 0]) >> al  # arithmetic shift (G.1.2.1)
        diff = dc - pred[ci]
        pred[ci] = dc
        t = _mag_cat(diff)
        code, ln = dc_tabs[ci][t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _emit_dc_refine(bw, comp_zzs, order, al) -> None:
    """DC refinement scan: one raw bit (bit Al of each DC) per block."""
    for ci, bi in order:
        bw.write((int(comp_zzs[ci][bi, 0]) >> al) & 1, 1)


def _emit_ac_first(bw, zzs, ac_tab, ss, se, al) -> None:
    """Single-component AC first pass over band Ss..Se at precision Al
    (run/size + ZRL + per-block EOB; EOB runs capped at 1)."""
    for bi in range(zzs.shape[0]):
        blk = zzs[bi]
        run = 0
        wrote = False
        for k in range(ss, se + 1):
            v = _pt_ac(int(blk[k]), al)
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_tab[0xF0]
                bw.write(code, ln)
                run -= 16
            s = _mag_cat(v)
            code, ln = ac_tab[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
            wrote = True
        if run > 0 or not wrote:
            code, ln = ac_tab[0x00]  # EOB (run of exactly 1)
            bw.write(code, ln)


def _emit_ac_refine(bw, zzs, ac_tab, ss, se, al) -> None:
    """Single-component AC refinement (G.2.3, the jcphuff-style
    bookkeeping): newly-nonzero coefficients (|v|>>Al == 1) emit
    (run<<4)|1 + a sign bit, where `run` counts only zero-HISTORY
    positions; every history-nonzero coefficient passed over buffers
    one correction bit (bit Al of |v|), flushed right after the next
    emitted symbol's own bits. A block's trailing zero-history run
    becomes a plain EOB carrying the remaining buffered bits."""
    for bi in range(zzs.shape[0]):
        blk = zzs[bi]
        eob = -1  # last newly-nonzero position
        for k in range(ss, se + 1):
            if abs(int(blk[k])) >> al == 1:
                eob = k
        run = 0
        pending: list[int] = []
        for k in range(ss, se + 1):
            t = abs(int(blk[k])) >> al
            if t == 0:
                run += 1
                continue
            while run > 15 and k <= eob:
                code, ln = ac_tab[0xF0]
                bw.write(code, ln)
                run -= 16
                for b in pending:
                    bw.write(b, 1)
                pending = []
            if t > 1:  # history-nonzero: buffer the correction bit
                pending.append(t & 1)
                continue
            code, ln = ac_tab[(run << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if int(blk[k]) >= 0 else 0, 1)
            run = 0
            for b in pending:
                bw.write(b, 1)
            pending = []
        if run > 0 or pending:
            code, ln = ac_tab[0x00]  # EOB closing this block
            bw.write(code, ln)
            for b in pending:
                bw.write(b, 1)


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, progressive: bool = False
) -> bytes:
    """uint8 [h, w] gray or [h, w, 3] RGB -> JPEG bytes (4:4:4,
    standard Annex K tables at the given quality). `progressive=True`
    emits SOF2 with a spectral-selection x successive-approximation
    scan script (DC first Al=1 -> AC 1..5 / 6..63 first Al=1 per
    component -> AC refine 1..63 per component -> DC refine): the same
    quantized coefficients as the baseline stream, so decode output is
    pixel-identical between the two envelopes."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    ql = _quality_scale(QUANT_LUMA, quality).reshape(8, 8)
    qc = _quality_scale(QUANT_CHROMA, quality).reshape(8, 8)
    if gray:
        planes = [pixels.astype(np.float64) - 128.0]
        qts, comp_q = [ql], [0]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts, comp_q = [ql, qc, qc], [0, 1, 1]
    nc = len(planes)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tq, qt in enumerate([ql] if gray else [ql, qc]):
        zz = qt.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([tq]) + zz.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, comp_q[i]])
    out += seg(0xC2 if progressive else 0xC0, sof)
    specs = [(0, 0, DC_LUMA_BITS, DC_LUMA_VALS), (0, 1, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        specs += [(1, 0, DC_CHROMA_BITS, DC_CHROMA_VALS),
                  (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for th, tc, bits, vals in specs:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    # block-padded planes + the shared quantized coefficient arrays
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    comp_zzs = []
    for i, p in enumerate(planes):
        pp = np.zeros((bh * 8, bwid * 8))
        pp[:h, :w] = p
        if w % 8:
            pp[:h, w:] = p[:, -1:]  # edge-replicate padding
        if h % 8:
            pp[h:, :] = pp[h - 1 : h, :]
        comp_zzs.append(_plane_coeffs(pp, qts[i]))

    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
    dc_tabs = [dc_l] + [dc_c] * (nc - 1)
    ac_tabs = [ac_l] + [ac_c] * (nc - 1)
    # 4:4:4 interleaved walk: one block per component per MCU
    order = [(ci, bi) for bi in range(bh * bwid) for ci in range(nc)]

    def sos_scan(comps: list[int], ss, se, ah, al, body_writer) -> None:
        sos = bytes([len(comps)])
        for ci in comps:
            td_ta = 0x00 if ci == 0 else 0x11
            sos += bytes([ci + 1, td_ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(seg(0xDA, sos))
        bw = _BitWriter()
        body_writer(bw)
        bw.flush()
        out.extend(bw.out)

    if not progressive:
        def body(bw):
            zlists = [z.tolist() for z in comp_zzs]
            pred = dict.fromkeys(range(nc), 0)
            for ci, bi in order:
                _encode_block(bw, zlists[ci][bi], ci, pred,
                              dc_tabs[ci], ac_tabs[ci])
        sos_scan(list(range(nc)), 0, 63, 0, 0, body)
    else:
        sos_scan(list(range(nc)), 0, 0, 0, 1,
                 lambda bw: _emit_dc_first(bw, comp_zzs, order, dc_tabs, 1))
        for ci in range(nc):
            for ss, se in ((1, 5), (6, 63)):
                sos_scan([ci], ss, se, 0, 1,
                         lambda bw, ci=ci, ss=ss, se=se: _emit_ac_first(
                             bw, comp_zzs[ci], ac_tabs[ci], ss, se, 1))
        for ci in range(nc):
            sos_scan([ci], 1, 63, 1, 0,
                     lambda bw, ci=ci: _emit_ac_refine(
                         bw, comp_zzs[ci], ac_tabs[ci], 1, 63, 0))
        sos_scan(list(range(nc)), 0, 0, 1, 0,
                 lambda bw: _emit_dc_refine(bw, comp_zzs, order, 0))
    out += b"\xff\xd9"
    return bytes(out)
