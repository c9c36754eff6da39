"""Baseline JPEG codec from scratch (public spec: ITU-T T.81 / ISO
10918-1), stdlib + numpy only — no codec library ships in this
container.

Decoder (`decode_jpeg`): baseline sequential DCT (SOF0), 8-bit, 1 or 3
components, arbitrary sampling factors up to 2x2 (4:4:4 / 4:2:2 /
4:2:0), restart markers, 0xFF00 byte stuffing. Huffman tables are
built FROM THE FILE'S OWN DHT segments (spec-driven — decoding a
real-world JPEG validates the marker walk, canonical-code
construction, MCU layout, dequant, IDCT and color convert against the
public format, independent of this module's encoder constants).
Progressive (SOF2), arithmetic coding, 12-bit precision and 16-bit
quant tables raise — honest gaps, not misdecodes.

Encoder (`encode_jpeg`): gray or RGB 4:4:4 with the Annex K standard
quantization + huffman tables, quality scaling per the public IJG
formula. Exists for round-trip tests and synthetic fixtures; JPEG is
lossy, so round-trip assertions are PSNR bounds, not equality.

Entropy decode is a per-bit Python loop — correctness-first; fine for
the test-scale images the multimodal plumbing decodes, and the honest
swap-in point for a vectorized/library path in production (the Spark
side only ever calls this inside Arrow-batched stages).
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


def _build_decode_lut(bits: list[int], vals: list[int]) -> np.ndarray:
    """Flat 2^16 lookup table: entry[peeked 16 bits] = (code_length <<
    8) | symbol, 0 = invalid prefix. One array index replaces the
    bit-by-bit tree walk (the classic fast-huffman construction: every
    16-bit word starting with an L-bit code maps to that code)."""
    lut = np.zeros(1 << 16, dtype=np.int32)
    for (length, code), sym in _build_decode_table(bits, vals).items():
        start = code << (16 - length)
        lut[start : start + (1 << (16 - length))] = (length << 8) | sym
    return lut


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol -> (code, length)} from the same canonical construction."""
    return {v: (c, l) for (l, c), v in _build_decode_table(bits, vals).items()}


# ------------------------------------------------------------- bit reader


class _BitReader:
    """Buffered MSB-first reader over entropy-coded data with 0xFF00
    unstuffing (T.81 F.2.2.5). Fills whole bytes into an accumulator
    and stops (without consuming) at any marker; `peek16` pads with
    1-bits past the stream end — T.81's padding convention — so the
    LUT lookahead on the final code of a scan/restart-chunk is safe."""

    __slots__ = ("data", "pos", "acc", "n", "stopped")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.stopped = None  # None | ("rst", code) | ("marker", code)

    def _fill_byte(self) -> bool:
        if self.stopped is not None or self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 2  # stuffed data byte
            elif 0xD0 <= nxt <= 0xD7:
                self.stopped = ("rst", nxt)
                return False
            else:
                self.stopped = ("marker", nxt)
                return False
        else:
            self.pos += 1
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
        self.n += 8
        return True

    def peek16(self) -> int:
        while self.n < 16 and self._fill_byte():
            pass
        if self.n >= 16:
            return (self.acc >> (self.n - 16)) & 0xFFFF
        cur = self.acc & ((1 << self.n) - 1) if self.n else 0
        pad = 16 - self.n
        return ((cur << pad) | ((1 << pad) - 1)) & 0xFFFF

    def read_bits(self, count: int) -> int:
        if count == 0:
            return 0
        while self.n < count and self._fill_byte():
            pass
        if self.n < count:
            if self.stopped and self.stopped[0] == "rst":
                raise _RestartMarker(self.stopped[1])
            raise ValueError("entropy data exhausted mid-symbol")
        self.n -= count
        return (self.acc >> self.n) & ((1 << count) - 1)

    def sync_to_marker(self) -> None:
        """Drop partial-byte padding and consume an expected RST."""
        self.acc = 0
        self.n = 0
        self.stopped = None
        while self.pos + 1 < len(self.data) and (
            self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00
        ):
            self.pos += 1
        if self.pos + 1 < len(self.data) and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, code: int):
        self.code = code


def _decode_huffman(br: _BitReader, lut: np.ndarray) -> int:
    entry = int(lut[br.peek16()])
    if entry == 0:
        raise ValueError("invalid huffman code in entropy data")
    br.read_bits(entry >> 8)  # consume the code's real bits
    return entry & 0xFF


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------- decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 pixel array ([h, w] gray or [h, w, 3]
    RGB). See module docstring for the supported envelope."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    restart_interval = 0
    out_planes: dict[int, np.ndarray] | None = None

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
                lut = _build_decode_lut(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = lut
                b += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 baseline-compatible
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
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG supported (SOF marker C{marker & 0xF:X})"
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
            out_planes, pos = _decode_scan(
                payload, pos + 2 + seg_len, frame, scan, quant,
                huff_dc, huff_ac, restart_interval,
            )
            # tolerate pad bytes between entropy data and the next marker
            while pos + 1 < len(payload) and (
                payload[pos] != 0xFF or payload[pos + 1] == 0x00
            ):
                pos += 1
            continue
        # APPn / COM / others: skip
        pos += 2 + seg_len

    if frame is None or out_planes is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = frame
    if len(comps) == 1:
        return out_planes[comps[0][0]][:h, :w].astype(np.uint8)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
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


def _decode_scan(data, pos, frame, scan, quant, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    scan_by_cid = {cs: (td, ta) for cs, td, ta in scan}
    planes = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    # entropy-decode the whole scan into per-component coefficient
    # stacks, then run ONE batched dequant + IDCT per component (an
    # einsum over [n_blocks, 8, 8]) instead of two 8x8 matmuls per
    # block from inside the python loop
    coeffs: dict[int, list] = {cid: [] for cid, *_ in comps}
    spots: dict[int, list] = {cid: [] for cid, *_ in comps}
    br = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_to_marker()
                pred = {cid: 0 for cid, *_ in comps}
            try:
                for cid, hs, vs, tq in comps:
                    td, ta = scan_by_cid[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            coeffs[cid].append(
                                _decode_block_coeffs(
                                    br, huff_dc[td], huff_ac[ta], pred, cid
                                )
                            )
                            spots[cid].append(
                                ((my * vs + by) * 8, (mx * hs + bx) * 8)
                            )
            except _RestartMarker:
                raise ValueError("restart marker landed mid-MCU") from None
            mcu_count += 1
    for cid, hs, vs, tq in comps:
        if not coeffs[cid]:
            continue
        stack = np.stack(coeffs[cid]).astype(np.float64) * quant[tq][None, :, :]
        blocks = np.einsum("ij,njk,kl->nil", _D.T, stack, _D)
        plane = planes[cid]
        for (y0, x0), blk in zip(spots[cid], blocks):
            plane[y0 : y0 + 8, x0 : x0 + 8] = blk
    return (
        {cid: np.clip(np.round(p + 128.0), 0, 255) for cid, p in planes.items()},
        br.pos,
    )


def _decode_block_coeffs(br, dc_table, ac_table, pred, cid) -> np.ndarray:
    """Entropy-decode one block -> natural-order [8, 8] int coefficients
    (dequant + IDCT happen batched per scan)."""
    zz = np.zeros(64, dtype=np.int64)
    t = _decode_huffman(br, dc_table)
    diff = _extend(br.read_bits(t), t)
    pred[cid] += diff
    zz[0] = pred[cid]
    k = 1
    while k < 64:
        rs = _decode_huffman(br, ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    nat = np.zeros(64, dtype=np.int64)
    nat[ZIGZAG] = zz
    return nat.reshape(8, 8)


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


def _encode_block(bw, blk, qt, pred_key, pred, dc_tab, ac_tab) -> None:
    coeffs = _D @ blk.astype(np.float64) @ _D.T
    q = np.round(coeffs / qt).astype(np.int64)
    zz = q.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred[pred_key]
    pred[pred_key] = int(zz[0])
    t = _mag_cat(diff)
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.nonzero(zz)[0].max()) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                code, ln = ac_tab[0xF0]  # ZRL
                bw.write(code, ln)
                run = 0
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
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """uint8 [h, w] gray or [h, w, 3] RGB -> baseline JPEG bytes
    (4:4:4, standard tables at the given quality)."""
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

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tq, qt in enumerate([ql] if gray else [ql, qc]):
        zz = qt.reshape(-1)[ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([tq]) + zz.tobytes())
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, 0x11, comp_q[i]])
    out += seg(0xC0, sof)
    specs = [(0, 0, DC_LUMA_BITS, DC_LUMA_VALS), (0, 1, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        specs += [(1, 0, DC_CHROMA_BITS, DC_CHROMA_VALS),
                  (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for th, tc, bits, vals in specs:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    sos = bytes([nc])
    for i in range(nc):
        td_ta = 0x00 if (gray or i == 0) else 0x11
        sos += bytes([i + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
    bw = _BitWriter()
    pred = {i: 0 for i in range(nc)}
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.zeros((bh * 8, bwid * 8))
        pp[:h, :w] = p
        if w % 8:
            pp[:h, w:] = p[:, -1:]  # edge-replicate padding
        if h % 8:
            pp[h:, :] = pp[h - 1 : h, :]
        padded.append(pp)
    for by in range(bh):
        for bx in range(bwid):
            for i in range(nc):
                qt = qts[i]
                dt, at = (dc_l, ac_l) if (gray or i == 0) else (dc_c, ac_c)
                blk = padded[i][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                _encode_block(bw, blk, qt, i, pred, dt, at)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
