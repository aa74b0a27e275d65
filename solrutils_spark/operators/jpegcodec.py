"""Baseline JPEG (JFIF) codec in pure Python + numpy — no codec library.

Closes (round 4→5) the JPEG half of the multimodal waiver the same way round 4
closed PNG (stdlib zlib) and GIF (pure-Python LZW): the container ships no
libjpeg/Pillow and pip is disallowed, but baseline sequential JPEG (SOF0,
Huffman, 8-bit) is implementable from the ITU T.81 spec with numpy doing
the DCT math. MP3/MP4 remain honestly gated (they need real codec libs).

Scope (loud ``NotImplementedError`` beyond it, matching the repo's
loud-failure contract):

- decode: baseline DCT (SOF0/1) AND progressive (SOF2, round 5: all four
  T.81 Annex G scan types — interleaved DC first/refine, per-component
  spectral-selection AC first/refine with successive approximation and
  EOB-run coding; validated against an independently-produced real-world
  progressive file). 8-bit, gray or YCbCr, sampling factors up to 2x2
  (4:4:4 / 4:2:2 / 4:2:0), restart markers (DRI/RSTn), multiple DQT/DHT
  segments incl. between scans. Arithmetic coding, 12-bit, lossless and
  hierarchical modes raise.
- encode: test-fixture encoder — gray or 4:4:4 / 4:2:0 color, Annex K
  quantization tables scaled by a quality factor; baseline uses Annex K
  Huffman tables, ``progressive=True`` emits an SOF2 scan script with
  per-scan optimal Huffman tables (Annex K carries no EOBn symbols) that
  reconstructs bit-identically to the baseline path (successive
  approximation is coefficient-lossless; the tests pin this).

This is a correctness-first decoder for the multimodal ingest path (the
Spark-side plumbing batches payloads through Arrow; see
``operators/multimodal.py``); per-pixel throughput is bounded by the pure-
Python Huffman bit reader, which is fine for the fixture-sized images the
tests use and documented here for anyone pointing it at photos.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II basis: IDCT(block) = B.T @ coef @ B
_B = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _B[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )

# Annex K (K.1) luminance / chrominance quantization tables, natural order
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K (K.3) Huffman table specs: (bits[1..16], values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (code_length, code) → symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol → (code, code_length)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any real marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG: Huffman code longer than 16 bits")

    def align(self) -> None:
        self.nbits = 0  # byte-align (before a restart marker)


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude v to signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF → HxWx3 uint8 RGB (or HxWx1 for grayscale streams)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"invalid JPEG: expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                nat = np.empty(64, dtype=np.int64)
                nat[_ZIGZAG] = tbl  # zigzag → natural order
                qt[tid] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                values = list(seg[i + 17:i + 17 + nv])
                (huff_dc if cls == 0 else huff_ac)[tid] = _build_decode_table(bits, values)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            _prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if _prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker == 0xC2:  # SOF2 progressive (Huffman)
            return _decode_jpeg_progressive(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential (SOF0/1) "
                "and progressive (SOF2) are supported — lossless/arithmetic/"
                "hierarchical streams need a codec library")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            ns = seg[0]
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tabs >> 4, tabs & 0xF
            pos += seglen
            return _decode_scan(payload, pos, h, w, comps, qt, huff_dc,
                                huff_ac, restart_interval)
        pos += seglen
    raise ValueError("invalid JPEG: no SOS segment")


def _decode_scan(data, pos, h, w, comps, qt, huff_dc, huff_ac, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2x2 not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        cw, ch = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ch, cw), dtype=np.float64))
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_in_segment = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_segment == restart_interval:
                reader.align()
                # expect RSTn next (already positioned at the marker bytes)
                if data[reader.pos] == 0xFF and 0xD0 <= data[reader.pos + 1] <= 0xD7:
                    reader.pos += 2
                pred = [0] * len(comps)
                mcu_in_segment = 0
            for ci, c in enumerate(comps):
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            coef = _decode_block(reader, huff_dc[c["td"]],
                                                 huff_ac[c["ta"]], pred, ci)
                        except _MarkerHit:
                            raise ValueError("invalid JPEG: truncated scan")
                        blk = _B.T @ (coef * q) @ _B + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
            mcu_in_segment += 1
    return _planes_to_image(planes, comps, h, w, hmax, vmax)


def _planes_to_image(planes, comps, h, w, hmax, vmax):
    """Upsample component planes to full resolution, crop, color-convert."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return y.astype(np.uint8)[..., None]
    Y, Cb, Cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = Y + 1.402 * Cr
    g = Y - 0.344136 * Cb - 0.714136 * Cr
    b = Y + 1.772 * Cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_tab, ac_tab, pred, ci):
    coef = np.zeros(64, dtype=np.float64)
    t = reader.decode_symbol(dc_tab)
    diff = _extend(reader.read_bits(t), t) if t else 0
    pred[ci] += diff
    coef[0] = pred[ci]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("invalid JPEG: AC run past block end")
        coef[_ZIGZAG[k]] = _extend(reader.read_bits(s), s)
        k += 1
    out = np.empty((8, 8), dtype=np.float64)
    out.flat = coef
    return out


# -------------------------------------------------- progressive decode ----

def _next_marker(data: bytes, pos: int) -> int:
    """Scan forward to the next real marker (skips stuffed FF00 and fill
    FFs) and return the position of its 0xFF byte."""
    n = len(data)
    while pos < n - 1:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    raise ValueError("invalid JPEG: ran off the end looking for a marker")


def _decode_jpeg_progressive(payload: bytes) -> np.ndarray:
    """Progressive JFIF (SOF2, Huffman) → HxWx3 uint8 RGB (HxWx1 gray).

    T.81 Annex G: coefficients accumulate across scans — DC first/refine
    (interleaved allowed), AC first/refine (single-component, spectral
    band Ss..Se, successive approximation Ah→Al with EOB-run coding) —
    then one dequantize+IDCT pass. Same no-codec-library playbook as the
    PNG/GIF decoders; reference parity target is what
    ExternalFileLoader-style pipelines feed through codec hooks."""
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = hmax = vmax = mcux = mcuy = 0
    restart_interval = 0
    coefs: list[np.ndarray] = []  # per comp: (bv_pad, bh_pad, 64) natural order
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"invalid JPEG: expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (identical handling to baseline)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                nat = np.empty(64, dtype=np.int64)
                nat[_ZIGZAG] = tbl
                qt[tid] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT — may also appear BETWEEN scans
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                values = list(seg[i + 17:i + 17 + nv])
                (huff_dc if cls == 0 else huff_ac)[tid] = _build_decode_table(bits, values)
                i += 17 + nv
        elif marker == 0xC2:
            _prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if _prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax > 2 or vmax > 2:
                raise NotImplementedError("sampling factors above 2x2 not supported")
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                # real (non-interleaved) block grid vs MCU-padded grid
                cw = -(-(w * c["h"]) // hmax)
                ch = -(-(h * c["v"]) // vmax)
                c["bw"], c["bh"] = -(-cw // 8), -(-ch // 8)
                coefs.append(np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                                      dtype=np.int32))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("invalid JPEG: second SOF in a progressive stream")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            if not comps:
                raise ValueError("invalid JPEG: SOS before SOF")
            ns = seg[0]
            scan: list[int] = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                for ci, comp in enumerate(comps):
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tabs >> 4, tabs & 0xF
                        scan.append(ci)
            ss, se, aa = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = aa >> 4, aa & 0xF
            end = _decode_prog_scan(
                payload, pos + seglen, comps, scan, coefs, ss, se, ah, al,
                huff_dc, huff_ac, mcux, mcuy, restart_interval)
            pos = end
            continue
        pos += seglen
    if not coefs:
        raise ValueError("invalid JPEG: no SOS segment")
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        blocks = coefs[ci].astype(np.float64)  # natural order
        bv, bh = blocks.shape[:2]
        plane = np.empty((bv * 8, bh * 8), dtype=np.float64)
        for y in range(bv):
            for x in range(bh):
                coef = blocks[y, x].reshape(8, 8)
                # EXACT same float expression as the baseline scan decoder,
                # so a progressive stream of the same coefficients produces
                # bit-identical pixels (the tests pin this equality)
                plane[y * 8:y * 8 + 8, x * 8:x * 8 + 8] = (
                    _B.T @ (coef * q) @ _B + 128.0)
        planes.append(plane)
    return _planes_to_image(planes, comps, h, w, hmax, vmax)


def _decode_prog_scan(data, pos, comps, scan, coefs, ss, se, ah, al,
                      huff_dc, huff_ac, mcux, mcuy, restart_interval):
    """Decode one progressive scan into the coefficient accumulators;
    returns the payload position of the next marker."""
    reader = _BitReader(data, pos)
    state = {"eobrun": 0, "pred": [0] * len(comps)}
    try:
        return _run_prog_scan(data, reader, state, comps, scan, coefs, ss,
                              se, ah, al, huff_dc, huff_ac, mcux, mcuy,
                              restart_interval)
    except (_MarkerHit, IndexError) as e:
        raise ValueError("invalid JPEG: truncated or corrupt scan") from e


def _run_prog_scan(data, reader, state, comps, scan, coefs, ss, se, ah, al,
                   huff_dc, huff_ac, mcux, mcuy, restart_interval):

    def dc_first(block, ci):
        t = reader.decode_symbol(huff_dc[comps[ci]["td"]])
        diff = _extend(reader.read_bits(t), t) if t else 0
        state["pred"][ci] += diff
        block[0] = state["pred"][ci] << al

    def dc_refine(block, ci):
        if reader.read_bit():
            block[0] |= 1 << al

    def ac_first(block, ci):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        tab = huff_ac[comps[ci]["ta"]]
        k = ss
        while k <= se:
            rs = reader.decode_symbol(tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:  # EOBn: run of (1<<r)-1+ext END-OF-BAND blocks
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("invalid JPEG: AC run past band end")
            block[_ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
            k += 1

    def ac_refine(block, ci):
        # T.81 G.2 / libjpeg decode_mcu_AC_refine: correction bits for
        # history-nonzero coefficients interleave with newly-significant
        # insertions; an EOB run still carries correction bits
        tab = huff_ac[comps[ci]["ta"]]
        p1, m1 = 1 << al, -1 << al

        def correct(k_):
            c = _ZIGZAG[k_]
            if block[c] != 0 and reader.read_bit() and not (block[c] & p1):
                block[c] += p1 if block[c] >= 0 else m1

        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = reader.decode_symbol(tab)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r < 15:
                        state["eobrun"] = (1 << r) - 1
                        if r:
                            state["eobrun"] += reader.read_bits(r)
                        state["eobrun"] += 1  # consumed below for THIS block
                        break
                    # ZRL: skip 16 zero-history positions, correcting others
                else:
                    if s != 1:
                        raise ValueError("invalid JPEG: AC refine size != 1")
                    val = p1 if reader.read_bit() else m1
                while k <= se:
                    c = _ZIGZAG[k]
                    if block[c] != 0:
                        if reader.read_bit() and not (block[c] & p1):
                            block[c] += p1 if block[c] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val:
                    if k > se:
                        # a desynced stream must fail loudly, matching
                        # ac_first's 'AC run past band end' (r5 ADVICE, low)
                        raise ValueError(
                            "invalid JPEG: AC refine run past band end"
                        )
                    block[_ZIGZAG[k]] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                correct(k)
                k += 1
            state["eobrun"] -= 1

    if ah == 0:
        per_block = dc_first if ss == 0 else ac_first
    else:
        per_block = dc_refine if ss == 0 else ac_refine

    def maybe_restart(units_done):
        if restart_interval and units_done and units_done % restart_interval == 0:
            reader.align()
            if data[reader.pos] == 0xFF and 0xD0 <= data[reader.pos + 1] <= 0xD7:
                reader.pos += 2
            state["eobrun"] = 0
            state["pred"] = [0] * len(comps)

    if len(scan) > 1:  # interleaved (DC scans only, per T.81)
        if ss != 0:
            raise ValueError("invalid JPEG: interleaved AC scan")
        units = 0
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(units)
                for ci in scan:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            per_block(
                                coefs[ci][my * c["v"] + by, mx * c["h"] + bx],
                                ci)
                units += 1
    else:  # non-interleaved: the component's REAL block grid (T.81 A.2.2)
        ci = scan[0]
        c = comps[ci]
        units = 0
        for y in range(c["bh"]):
            for x in range(c["bw"]):
                maybe_restart(units)
                per_block(coefs[ci][y, x], ci)
                units += 1
    return _next_marker(data, reader.pos)


# ------------------------------------------------------------- encoder ----

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255)


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw, coef, q, pred, ci, dc_tab, ac_tab):
    quant = np.round(coef / q).astype(np.int64)
    zz = quant.flatten()[_ZIGZAG]  # natural order → zigzag stream order
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t = _mag_cat(diff)
    code, length = dc_tab[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = np.flatnonzero(zz[1:])
    last = last_nz[-1] + 1 if last_nz.size else 0
    for k in range(1, 64):
        if k > last:
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]
            bw.write(code, length)
            run -= 16
        s = _mag_cat(v)
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_tab[0x00]
        bw.write(code, length)


def _gen_huffman_spec(freq256: list[int]) -> tuple[list[int], list[int]]:
    """Optimal JPEG Huffman table from symbol frequencies (T.81 K.2-K.3,
    the jpeg_gen_optimal_table procedure): returns (bits[16], huffval).
    A dummy 257th symbol with frequency 1 reserves the all-ones code, and
    code lengths are folded down to the 16-bit ceiling."""
    freq = list(freq256) + [1]
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1 = c2 = -1
        v = float("inf")
        for i in range(257):  # smallest freq; ties → larger symbol index
            if freq[i] and freq[i] <= v:
                v, c1 = freq[i], i
        v = float("inf")
        for i in range(257):
            if freq[i] and freq[i] <= v and i != c1:
                v, c2 = freq[i], i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for s in codesize:
        if s:
            bits[s] += 1
    i = 32
    while i > 16:  # K.3: push over-long codes up into shorter slots
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the dummy (the reserved all-ones code)
    huffval = [s for size in range(1, 17)
               for s in range(256) if codesize[s] == size]
    return bits[1:17], huffval


class _FreqSink:
    """Counting pass: tallies Huffman symbols per table id."""

    def __init__(self):
        self.freq: dict[int, list[int]] = {}

    def sym(self, tid: int, s: int) -> None:
        self.freq.setdefault(tid, [0] * 256)[s] += 1

    def bits(self, v: int, n: int) -> None:
        pass


class _WriteSink:
    """Emitting pass: writes Huffman codes + raw bits."""

    def __init__(self, bw: "_BitWriter", tables: dict[int, dict]):
        self.bw = bw
        self.tables = tables

    def sym(self, tid: int, s: int) -> None:
        code, length = self.tables[tid][s]
        self.bw.write(code, length)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.bw.write(v, n)


def _enc_dc_first(sink, zzb, samp, dctid, mcux, mcuy, al):
    pred = [0] * len(zzb)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(zzb[ci][my * sv + by, mx * sh + bx, 0]) >> al
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        t = _mag_cat(diff)
                        sink.sym(dctid[ci], t)
                        sink.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _enc_dc_refine(bw, zzb, samp, mcux, mcuy, al):
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(zzb[ci][my * sv + by, mx * sh + bx, 0])
                        bw.write((dc >> al) & 1, 1)


def _enc_ac_first(sink, tid, blocks, ss, se, al):
    """AC first scan over one component's real block grid (T.81 G.1.2.2:
    magnitude categories of ``|v| >> Al`` with EOBn run coding)."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            sink.sym(tid, nb << 4)
            sink.bits(eobrun & ((1 << nb) - 1), nb)
            eobrun = 0

    for block in blocks:
        r = 0
        for k in range(ss, se + 1):
            v = int(block[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                sink.sym(tid, 0xF0)
                r -= 16
            s = t.bit_length()
            sink.sym(tid, (r << 4) | s)
            sv = t if v >= 0 else -t
            sink.bits(sv if sv >= 0 else sv + (1 << s) - 1, s)
            r = 0
        if r:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine(sink, tid, blocks, ss, se, al):
    """AC refinement scan (T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine):
    newly-significant coefficients code as (run<<4)|1 + sign bit; already
    nonzero ones contribute buffered correction bits; end-of-band runs
    carry their correction bits after the EOBn symbol."""
    eobrun = 0
    pend: list[int] = []

    def flush_eob():
        nonlocal eobrun, pend
        if eobrun:
            nb = eobrun.bit_length() - 1
            sink.sym(tid, nb << 4)
            sink.bits(eobrun & ((1 << nb) - 1), nb)
        for b in pend:
            sink.bits(b, 1)
        eobrun, pend = 0, []

    for block in blocks:
        eob = ss - 1  # position of the last newly-significant coefficient
        for k in range(ss, se + 1):
            if (abs(int(block[k])) >> al) == 1:
                eob = k
        r = 0
        br: list[int] = []
        for k in range(ss, se + 1):
            v = int(block[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:  # ZRLs not foldable into the EOB run
                flush_eob()
                sink.sym(tid, 0xF0)
                r -= 16
                for b in br:
                    sink.bits(b, 1)
                br = []
            if t > 1:  # already significant: buffer its correction bit
                br.append(t & 1)
                continue
            flush_eob()
            sink.sym(tid, (r << 4) | 1)
            sink.bits(1 if v >= 0 else 0, 1)
            for b in br:
                sink.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pend += br
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg(img: np.ndarray, quality: int = 90, subsample: bool = False,
                progressive: bool = False) -> bytes:
    """HxWx3 RGB (or HxW / HxWx1 gray) uint8 → JFIF bytes.

    ``subsample=True`` uses 4:2:0 chroma (exercises the decoder's
    upsampling path); default is 4:4:4. ``progressive=True`` emits an
    SOF2 stream with the full scan-type spectrum — interleaved DC first +
    refine, per-component spectral-selection AC first + refine at
    successive approximation Al=1→0 — with per-scan optimal Huffman
    tables (Annex K tables carry no EOBn symbols). Baseline is
    fixture-grade: Annex K tables, no restart markers."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[..., 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _scaled_q(_QL, quality).reshape(8, 8)
    qc = _scaled_q(_QC, quality).reshape(8, 8)
    dc_l, ac_l = _build_encode_table(*_DC_L), _build_encode_table(*_AC_L)
    dc_c, ac_c = _build_encode_table(*_DC_C), _build_encode_table(*_AC_C)

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qtabs = [ql]
        tabs = [(dc_l, ac_l)]
    else:
        rgb = img.astype(np.float64)
        Y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        Cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        Cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        if subsample:
            # pad to even then 2x2 mean-pool the chroma
            def pool(p):
                pe = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
                return (pe[0::2, 0::2] + pe[1::2, 0::2] + pe[0::2, 1::2] + pe[1::2, 1::2]) / 4.0
            planes = [Y - 128.0, pool(Cb) - 128.0, pool(Cr) - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [Y - 128.0, Cb - 128.0, Cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
        qtabs = [ql, qc, qc]
        tabs = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad each plane to its MCU-aligned size
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        padded.append(np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                             mode="edge"))

    if progressive:
        return _encode_progressive(padded, samp, qtabs, h, w, gray,
                                   mcux, mcuy, ql, qc)

    bw = _BitWriter()
    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = p[y0:y0 + 8, x0:x0 + 8]
                        coef = _B @ blk @ _B.T
                        _encode_block(bw, coef, qtabs[ci], pred, ci, *tabs[ci])
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid, tbl):
        zz = np.empty(64, dtype=np.int64)
        zz = tbl.flatten()[_ZIGZAG]  # natural → zigzag stream order
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(v) for v in zz)

    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls, tid, spec):
        bits, values = spec
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, _DC_L) + dht(1, 0, _AC_L)
    if not gray:
        out += dht(0, 1, _DC_C) + dht(1, 1, _AC_C)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_progressive(padded, samp, qtabs, h, w, gray, mcux, mcuy, ql, qc):
    """Assemble the SOF2 stream: quantized zigzag coefficients once, then
    the scan script (DC first → AC first per band/component → DC refine →
    AC refine), two passes per Huffman scan (count → optimal DHT → emit)."""
    ncomp = len(padded)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    zzb = []
    for p, q in zip(padded, qtabs):
        bv, bh = p.shape[0] // 8, p.shape[1] // 8
        quant = np.empty((bv, bh, 64), dtype=np.int64)
        for y in range(bv):
            for x in range(bh):
                blk = p[y * 8:y * 8 + 8, x * 8:x * 8 + 8]
                # EXACT same float expression as the baseline encoder so
                # round-half coefficients quantize identically — the tests
                # pin progressive == baseline bit-identity
                coef = _B @ blk @ _B.T
                quant[y, x] = np.round(coef / q).astype(np.int64).reshape(64)
        zzb.append(quant[..., _ZIGZAG])  # stream (zigzag) order
    # real (non-interleaved) block grids for the AC scans
    real = []
    for ci, (sh, sv) in enumerate(samp):
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        real.append((-(-ch // 8), -(-cw // 8)))  # (rows, cols)

    def ac_blocks(ci):
        rows, cols = real[ci]
        return [zzb[ci][y, x] for y in range(rows) for x in range(cols)]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid, tbl):
        zz = tbl.flatten()[_ZIGZAG]
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(v) for v in zz)

    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls, tid, spec):
        bits, values = spec
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def sos(comp_tabs, ss, se, ah, al):
        body = bytes([len(comp_tabs)])
        for cid, td, ta in comp_tabs:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    dctid = [0] + [1] * (ncomp - 1)

    def two_pass(run, cls, sos_bytes):
        """Count symbols, emit optimal DHT(s) + SOS, then the scan data."""
        nonlocal out
        fs = _FreqSink()
        run(fs)
        tables = {}
        for tid, freq in sorted(fs.freq.items()):
            spec = _gen_huffman_spec(freq)
            out += dht(cls, tid, spec)
            tables[tid] = _build_encode_table(*spec)
        out += sos_bytes
        bw = _BitWriter()
        run(_WriteSink(bw, tables))
        bw.flush()
        out += bw.out

    # 1. DC first (interleaved, successive approximation Al=1)
    two_pass(
        lambda sink: _enc_dc_first(sink, zzb, samp, dctid, mcux, mcuy, 1),
        0, sos([(ci + 1, dctid[ci], 0) for ci in range(ncomp)], 0, 0, 0, 1))
    # 2. AC first: comp 0 in two spectral-selection bands, chroma whole-band
    bands = [(0, 1, 5), (0, 6, 63)] + [(ci, 1, 63) for ci in range(1, ncomp)]
    for ci, ss_, se_ in bands:
        two_pass(
            lambda sink, ci=ci, ss_=ss_, se_=se_: _enc_ac_first(
                sink, 0, ac_blocks(ci), ss_, se_, 1),
            1, sos([(ci + 1, 0, 0)], ss_, se_, 0, 1))
    # 3. DC refine (interleaved, Ah=1 → Al=0): raw bits, no Huffman table
    out += sos([(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 1, 0)
    bw = _BitWriter()
    _enc_dc_refine(bw, zzb, samp, mcux, mcuy, 0)
    bw.flush()
    out += bw.out
    # 4. AC refine, same bands (Ah=1 → Al=0)
    for ci, ss_, se_ in bands:
        two_pass(
            lambda sink, ci=ci, ss_=ss_, se_=se_: _enc_ac_refine(
                sink, 0, ac_blocks(ci), ss_, se_, 0),
            1, sos([(ci + 1, 0, 0)], ss_, se_, 1, 0))
    out += b"\xff\xd9"
    return bytes(out)
