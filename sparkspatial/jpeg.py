"""Baseline + progressive JPEG (ITU-T T.81) codec, dependency-free
(r3 verdict item 5: "real JPEG decode for image_features" — no PIL in
this environment, so the DCT processes are implemented from the
public spec directly; progressive added r5, r4 verdict item 4: it is
the most common real-crawl format the family still rejected).

Decoder scope — what real Common-Crawl-ish JPEGs use:
- SOF0 (baseline sequential DCT, 8-bit), 1 or 3 components,
- SOF2 (progressive DCT, 8-bit): spectral selection + successive
  approximation, DC/AC first and refinement scans, EOB runs,
  interleaved DC scans and single-component scans with their
  non-interleaved block geometry (T.81 G.1/G.2, Annex A.2.2-A.2.4),
- arbitrary sampling factors 1..2 per axis (4:4:4, 4:2:2, 4:2:0),
- multiple DQT/DHT segments (between progressive scans too),
  8/16-bit quant tables,
- byte stuffing (FF 00) and DRI/RSTn restart markers,
- APPn/COM segments skipped.
Arithmetic coding, hierarchical (SOF3/5-7/9-15) and 12-bit precision
are rejected by returning None (same "invalid, never a crash"
contract as the other codecs in multimodal.py).

Encoder scope (fixture generator + round-trip witness): quality-scaled
Annex K quantization, Annex K Huffman tables, 4:4:4 or 4:2:0.

Numerics: the 8-point orthonormal DCT-II matrix gives EXACTLY the
spec's (1/4)C(u)C(v) coefficient scaling, so FDCT/IDCT are two clean
matrix products; all blocks of an image IDCT in one einsum. Entropy
coding is per-symbol Python (bounded by fixture sizes; the Spark-side
operators batch per Arrow partition, so the loop is per-task, not
per-row-in-driver).

Chroma upsampling is box replication (np.repeat) — deliberately the
simplest spec-legal choice; decoders differ here (libjpeg defaults to
triangular), which is why tests pin OUR decoder's bytes by hash and
check encoder->decoder error bounds rather than comparing against a
third-party decode.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "jpeg_dimensions"]

# ------------------------------------------------------------- constants

def _make_zigzag() -> np.ndarray:
    """Natural-order index of each zigzag position (spec Figure 5)."""
    idx, x, y = [], 0, 0
    for _ in range(64):
        idx.append(y * 8 + x)
        if (x + y) % 2 == 0:
            if x == 7:
                y += 1
            elif y == 0:
                x += 1
            else:
                x += 1
                y -= 1
        else:
            if y == 7:
                x += 1
            elif x == 0:
                y += 1
            else:
                x -= 1
                y += 1
    return np.array(idx, dtype=np.int64)


ZIGZAG = _make_zigzag()

# Annex K.1/K.2 quantization tables (natural order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

assert sum(DC_LUMA_BITS) == len(DC_LUMA_VALS) == 12
assert sum(DC_CHROMA_BITS) == len(DC_CHROMA_VALS) == 12
assert sum(AC_LUMA_BITS) == len(AC_LUMA_VALS) == 162
assert sum(AC_CHROMA_BITS) == len(AC_CHROMA_VALS) == 162


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis; A @ b @ A.T reproduces the
    spec's (1/4)C(u)C(v) forward-DCT scaling exactly (check:
    c(0)^2 = 1/8, c(0)c(k) = 1/(4*sqrt(2)), c(j)c(k) = 1/4)."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    a = np.cos((2 * n + 1) * k * np.pi / 16.0)
    a[0, :] *= np.sqrt(1.0 / 8.0)
    a[1:, :] *= np.sqrt(2.0 / 8.0)
    return a


_A = _dct_matrix()


def _canonical_codes(bits):
    """(code, length) per symbol in table order (spec Annex C)."""
    codes, code = [], 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes.append((code, length))
            code += 1
        code <<= 1
    return codes


# -------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # 1-pad per spec


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of a base table (public
    IJG formula: scale = 5000/Q below 50, 200-2Q above)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (qt * scale + 50) // 100
    return np.clip(q, 1, 255)


def _mag_bits(v: int):
    """(size, raw bits) for a DC diff / AC amplitude (spec F.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


def _encode_block(bw: _BitWriter, q: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    """Huffman-encode one quantized zigzag block; returns new DC pred."""
    dc = int(q[0])
    size, bits = _mag_bits(dc - pred)
    c, ln = dc_codes[size]
    bw.write(c, ln)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if q[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = ac_codes[0xF0]      # ZRL
            bw.write(c, ln)
            run -= 16
        size, bits = _mag_bits(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(bits, size)
        run = 0
    if last_nz != 63:
        c, ln = ac_codes[0x00]          # EOB
        bw.write(c, ln)
    return dc


def _component_qblocks(arr: np.ndarray, quality: int, subsample: bool):
    """Shared forward path of the baseline and progressive encoders:
    color transform, MCU-grid padding, per-block DCT + quantization.
    Returns (qblocks [(bh, bw, 64) int64 zigzag per comp], samp, qts,
    comp_qt, h, w, gray, mcus_x, mcus_y)."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        r = arr[..., 0].astype(np.float64)
        g = arr[..., 1].astype(np.float64)
        b = arr[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def _half(p):
                hh, ww = (h + 1) // 2, (w + 1) // 2
                pad = np.empty((hh * 2, ww * 2), dtype=np.float64)
                pad[:h, :w] = p
                pad[h:, :w] = p[h - 1:, :]
                pad[:h, w:] = pad[:h, w - 1:w]
                pad[h:, w:] = p[h - 1, w - 1]
                return pad.reshape(hh, 2, ww, 2).mean(axis=(1, 3))
            planes = [y - 128.0, _half(cb) - 128.0, _half(cr) - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]

    qts = [_quality_scale(QT_LUMA, quality),
           _quality_scale(QT_CHROMA, quality)]
    comp_qt = [0] if gray else [0, 1, 1]
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcus_x = (w + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (h + 8 * max_v - 1) // (8 * max_v)

    qblocks = []
    for ci, (p, (sh, sv)) in enumerate(zip(planes, samp)):
        ph, pw = mcus_y * sv * 8, mcus_x * sh * 8
        pp = np.empty((ph, pw), dtype=np.float64)
        ah, aw = p.shape
        pp[:ah, :aw] = p
        pp[ah:, :aw] = p[ah - 1:ah, :]
        pp[:, aw:] = pp[:, aw - 1:aw]
        qt = qts[comp_qt[ci]]
        bh, bwid = mcus_y * sv, mcus_x * sh
        qb = np.empty((bh, bwid, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bwid):
                blk = pp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                f = _A @ blk @ _A.T
                qb[by, bx] = np.round(f.reshape(64)[ZIGZAG]
                                      / qt[ZIGZAG]).astype(np.int64)
        qblocks.append(qb)
    return qblocks, samp, qts, comp_qt, h, w, gray, mcus_x, mcus_y


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsample: bool = False) -> bytes:
    """uint8 (h, w, 3) RGB (or (h, w) gray) -> baseline JFIF bytes.

    `subsample=True` writes 4:2:0 chroma (box-averaged), else 4:4:4.
    """
    (qblocks, samp, qts, comp_qt, h, w, gray,
     mcus_x, mcus_y) = _component_qblocks(arr, quality, subsample)
    dc_tables = [dict(zip(DC_LUMA_VALS, _canonical_codes(DC_LUMA_BITS))),
                 dict(zip(DC_CHROMA_VALS, _canonical_codes(DC_CHROMA_BITS)))]
    ac_tables = [dict(zip(AC_LUMA_VALS, _canonical_codes(AC_LUMA_BITS))),
                 dict(zip(AC_CHROMA_VALS, _canonical_codes(AC_CHROMA_BITS)))]

    bw = _BitWriter()
    preds = [0] * len(qblocks)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (qb, (sh, sv)) in enumerate(zip(qblocks, samp)):
                dct = dc_tables[0 if ci == 0 else 1]
                act = ac_tables[0 if ci == 0 else 1]
                for by in range(sv):
                    for bx in range(sh):
                        q = qb[my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(bw, q, preds[ci],
                                                  dct, act)
    bw.flush()

    out = _emit_headers(qts, samp, comp_qt, h, w, gray, 0xC0)
    ncomp = 1 if gray else 3
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.buf
    out += b"\xFF\xD9"                                  # EOI
    return bytes(out)


def _emit_headers(qts, samp, comp_qt, h, w, gray,
                  sof_marker: int) -> bytearray:
    """SOI + APP0 + DQT + SOF + DHT — the header prefix shared by the
    baseline (0xC0) and progressive (0xC2) encoders (one definition
    so the two fixture generators can never drift; review-caught
    r5)."""
    out = bytearray(b"\xFF\xD8")                       # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) \
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"  # APP0
    for tid, qt in enumerate(qts[:1 if gray else 2]):
        zz = qt[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid) + zz
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, comp_qt[ci])
    out += bytes([0xFF, sof_marker]) \
        + struct.pack(">H", 2 + len(sof)) + sof
    hts = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
           (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        hts += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits, vals in hts:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
    return out


def _enc_ac_first_block(bw, band, al, ac_codes):
    """AC first scan, one block's band at point transform Al
    (T.81 G.1.2.2, EOB0-only variant: every block ends its own EOB
    run — spec-legal; multi-block EOBn decode is exercised by the
    real-file fixtures)."""
    vals = [int(v) for v in band]
    t = [(abs(v) >> al) * (1 if v >= 0 else -1) for v in vals]
    last_nz = -1
    for i, v in enumerate(t):
        if v:
            last_nz = i
    run = 0
    for i in range(last_nz + 1):
        v = t[i]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        size, bits = _mag_bits(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(bits, size)
        run = 0
    if last_nz != len(t) - 1:
        c, ln = ac_codes[0x00]                   # EOB0
        bw.write(c, ln)


def _enc_ac_refine_block(bw, band, al, ac_codes):
    """AC refinement scan, one block's band, Ah = Al+1 (T.81 G.1.2.3
    inverse): newly-significant coefficients ((|v| >> Al) == 1) emit
    (run, 1) codes + a sign bit; history coefficients buffer their
    correction bit, flushed after each emitted code in position order
    — exactly the interleave the decoder's advance loop reads."""
    vals = [int(v) for v in band]
    t = [abs(v) >> al for v in vals]
    pending: list[int] = []

    def flush():
        for bit in pending:
            bw.write(bit, 1)
        pending.clear()

    # last newly-significant index: pending ZRLs past it fold into the
    # EOB (and, critically, ZRLs must be emitted on ARRIVAL at any
    # nonzero position — history positions are flush barriers, else a
    # buffered correction bit from beyond a ZRL's 16-zero window would
    # desync the decoder's positional-interleave read)
    eob_idx = -1
    for i, mag in enumerate(t):
        if mag == 1:
            eob_idx = i
    run = 0
    for i, mag in enumerate(t):
        if mag == 0:
            run += 1
            continue
        while run > 15 and i <= eob_idx:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            flush()
            run -= 16
        if mag > 1:            # history: correction bit
            pending.append(t[i] & 1)
            continue
        c, ln = ac_codes[(run << 4) | 1]       # newly significant
        bw.write(c, ln)
        bw.write(1 if vals[i] > 0 else 0, 1)
        flush()
        run = 0
    if run or pending:
        c, ln = ac_codes[0x00]                   # EOB0
        bw.write(c, ln)
        flush()


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85,
                            subsample: bool = False,
                            al_chain: tuple = (1,),
                            restart_interval: int = 0) -> bytes:
    """uint8 RGB/gray -> PROGRESSIVE (SOF2) JFIF bytes — the fixture
    generator + round-trip witness for the r5 progressive decoder.

    Scan script: interleaved DC first at Al = al_chain[0], then per
    component AC first (1..63) at al_chain[0] and one AC refinement
    scan per further level down to 0, then an interleaved DC
    refinement per level. Decoding the result must be PIXEL-IDENTICAL
    to decoding encode_jpeg(arr, ...) — both paths transmit the same
    quantized coefficients (shared `_component_qblocks`), and the
    reconstruction tail is shared too.

    `restart_interval` > 0 writes a DRI segment and RSTn markers
    every that-many MCUs in every scan (one block = one MCU in the
    non-interleaved scans, T.81 A.2.2) — the round-trip witness for
    the decoder's progressive restart handling.
    """
    (qblocks, samp, qts, comp_qt, h, w, gray,
     mcus_x, mcus_y) = _component_qblocks(arr, quality, subsample)
    ncomp = len(qblocks)
    dc_tables = [dict(zip(DC_LUMA_VALS, _canonical_codes(DC_LUMA_BITS))),
                 dict(zip(DC_CHROMA_VALS, _canonical_codes(DC_CHROMA_BITS)))]
    ac_tables = [dict(zip(AC_LUMA_VALS, _canonical_codes(AC_LUMA_BITS))),
                 dict(zip(AC_CHROMA_VALS, _canonical_codes(AC_CHROMA_BITS)))]
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)

    out = _emit_headers(qts, samp, comp_qt, h, w, gray, 0xC2)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)

    rst_state = {"m": 0}

    def maybe_rst(bw, mcu_count, preds=None):
        """Byte-align + emit RSTn before MCU `mcu_count` when the
        interval divides it (mirrors the decoder's handle_restart)."""
        if restart_interval and mcu_count \
                and mcu_count % restart_interval == 0:
            bw.flush()
            bw.buf += bytes([0xFF, 0xD0 + rst_state["m"] % 8])
            rst_state["m"] += 1
            if preds is not None:
                for ci in range(len(preds)):
                    preds[ci] = 0

    def sos_header(comp_ids, tds, tas, ss, se, ah, al):
        sos = bytes([len(comp_ids)])
        for cid, td, ta in zip(comp_ids, tds, tas):
            sos += bytes([cid, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    al0 = al_chain[0]
    levels = list(al_chain) + [0] if al0 else [0]
    # scan 1: interleaved DC first at al0
    out += sos_header(list(range(1, ncomp + 1)),
                      [0 if c == 0 else 1 for c in range(ncomp)],
                      [0] * ncomp, 0, 0, 0, al0)
    bw = _BitWriter()
    rst_state["m"] = 0
    preds = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            maybe_rst(bw, my * mcus_x + mx, preds)
            for ci, (qb, (sh, sv)) in enumerate(zip(qblocks, samp)):
                dct = dc_tables[0 if ci == 0 else 1]
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(qb[my * sv + by, mx * sh + bx, 0]) >> al0
                        size, bits = _mag_bits(dc - preds[ci])
                        c, ln = dct[size]
                        bw.write(c, ln)
                        if size:
                            bw.write(bits, size)
                        preds[ci] = dc
    bw.flush()
    out += bw.buf

    # per component: AC first at al0, then refinements down the chain
    for ci in range(ncomp):
        qb, (sh, sv) = qblocks[ci], samp[ci]
        act = ac_tables[0 if ci == 0 else 1]
        ta = 0 if ci == 0 else 1
        cw = (w * sh + max_h - 1) // max_h
        ch = (h * sv + max_v - 1) // max_v
        nbw, nbh = (cw + 7) // 8, (ch + 7) // 8
        out += sos_header([ci + 1], [0], [ta], 1, 63, 0, al0)
        bw = _BitWriter()
        rst_state["m"] = 0
        for cnt, (by, bx) in enumerate(
                (y, x) for y in range(nbh) for x in range(nbw)):
            maybe_rst(bw, cnt)
            _enc_ac_first_block(bw, qb[by, bx, 1:64], al0, act)
        bw.flush()
        out += bw.buf
        for lvl in range(len(levels) - 1):
            ah, al = levels[lvl], levels[lvl + 1]
            if ah != al + 1:
                raise ValueError("al_chain must step by 1")
            out += sos_header([ci + 1], [0], [ta], 1, 63, ah, al)
            bw = _BitWriter()
            rst_state["m"] = 0
            for cnt, (by, bx) in enumerate(
                    (y, x) for y in range(nbh) for x in range(nbw)):
                maybe_rst(bw, cnt)
                _enc_ac_refine_block(bw, qb[by, bx, 1:64], al, act)
            bw.flush()
            out += bw.buf

    # interleaved DC refinement per level (raw bits, no Huffman)
    for lvl in range(len(levels) - 1):
        ah, al = levels[lvl], levels[lvl + 1]
        out += sos_header(list(range(1, ncomp + 1)), [0] * ncomp,
                          [0] * ncomp, 0, 0, ah, al)
        bw = _BitWriter()
        rst_state["m"] = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_rst(bw, my * mcus_x + mx)
                for ci, (qb, (sh, sv)) in enumerate(zip(qblocks, samp)):
                    for by in range(sv):
                        for bx in range(sh):
                            dc = int(qb[my * sv + by, mx * sh + bx, 0])
                            bw.write((dc >> al) & 1, 1)
                    # (bits only — no tables in a DC refinement scan)
        bw.flush()
        out += bw.buf

    out += b"\xFF\xD9"
    return bytes(out)


# -------------------------------------------------------------- decoder

class _BitReader:
    """Entropy-segment bit reader: un-stuffs FF 00, stops at markers
    (leaving position on the FF) — spec F.2.2.5."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                return 0          # spec: feed 0s past segment end
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(
                    self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:             # a marker: stall, feed zeros
                    return 0
            else:
                self.pos += 1
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self):
        self.nbits = 0


def _extend(v: int, t: int) -> int:
    """EXTEND (spec F.2.2.1): map T raw bits to a signed amplitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_huff(br: _BitReader, table: dict) -> int | None:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.read_bit()
        ln += 1
        v = table.get((ln, code))
        if v is not None:
            return v
    return None


def jpeg_dimensions(payload: bytes):
    """(width, height) from the SOF0 header alone, or None if the
    stream is not a baseline JPEG — the cheap metadata path
    (extract_meta uses this instead of paying the full per-MCU
    entropy decode just to report dimensions; r4 self-review).
    Header-level only: a stream with a valid header but truncated
    entropy data still reports its declared dimensions, matching the
    PPM header-parse semantics."""
    try:
        if len(payload) < 4 or payload[:2] != b"\xFF\xD8":
            return None
        i, n = 2, len(payload)
        while i < n - 1:
            if payload[i] != 0xFF:
                return None
            while i + 1 < n and payload[i + 1] == 0xFF:
                i += 1
            if i + 1 >= n:
                return None
            marker = payload[i + 1]
            i += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker == 0xD9:
                return None
            seg_len = struct.unpack_from(">H", payload, i)[0]
            if marker in (0xC0, 0xC2):          # SOF0 / SOF2 (r5)
                prec, h, w, nc = struct.unpack_from(">BHHB",
                                                    payload, i + 2)
                if prec != 8 or nc not in (1, 3) or not (h and w):
                    return None
                return w, h
            if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None
            if marker == 0xDA:
                return None          # scan before any frame header
            i += seg_len
        return None
    except (struct.error, IndexError):
        return None


def decode_jpeg(payload: bytes):
    """Baseline JFIF/JPEG bytes -> uint8 (h, w, 3) RGB array, or None
    for anything that is not a decodable baseline sequential JPEG."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError, KeyError, ValueError,
            ZeroDivisionError):
        # KeyError: e.g. SOS component selector ids that don't match
        # the SOF frame ids (r4 self-review: reproduced crash)
        return None


def _decode_jpeg(payload: bytes):
    if len(payload) < 4 or payload[:2] != b"\xFF\xD8":
        return None
    qts: dict = {}
    huffs: dict = {}
    comps = None
    progressive = False
    n_scans = 0
    h = w = 0
    restart_interval = 0
    i = 2
    n = len(payload)
    while i < n - 1:
        if payload[i] != 0xFF:
            return None
        # skip spec-legal fill bytes: any number of 0xFF may pad
        # before a marker code (T.81 B.1.1.2)
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        if i + 1 >= n:
            return None
        marker = payload[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:                      # EOI
            if progressive and n_scans:
                # progressive frame complete: reconstruct from the
                # accumulated coefficients
                return _idct_to_rgb(comps, h, w,
                                    max(c["h"] for c in comps),
                                    max(c["v"] for c in comps))
            return None                         # EOI before any scan
        seg_len = struct.unpack_from(">H", payload, i)[0]
        seg = payload[i + 2:i + seg_len]
        if marker == 0xDB:                      # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq > 1 or tq > 3:
                    # T.81 B.2.4.1: Pq is 0 (8-bit) or 1 (16-bit) and
                    # Tq <= 3 — anything else is a corrupt stream, and
                    # guessing a width would mis-consume the segment
                    # and shift every following marker (r4 ADVICE)
                    return None
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, j) \
                        .astype(np.int64)
                    j += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, j) \
                        .astype(np.int64)
                    j += 128
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = tbl
                qts[tq] = nat
        elif marker == 0xC4:                    # DHT
            j = 0
            while j < len(seg):
                tc_th = seg[j]
                if (tc_th >> 4) > 1 or (tc_th & 0x0F) > 3:
                    return None     # T.81 B.2.4.2: Tc in {0,1}, Th <= 3
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                table = {}
                for v, (code, ln) in zip(vals, _canonical_codes(bits)):
                    table[(ln, code)] = v
                huffs[tc_th] = table
                j += 17 + nv
        elif marker in (0xC0, 0xC2):            # SOF0 / SOF2
            if comps is not None:
                return None                      # duplicate frame header
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or nc not in (1, 3) or not (h and w):
                # zero-dimension frames must reject like
                # jpeg_dimensions does, not decode to an EMPTY array
                # that image_features would score as NaN (r5 review)
                return None
            if h * w > (1 << 26):
                # 67M-pixel cap: a corrupted/adversarial SOF would
                # otherwise allocate coefficient planes (GBs) before
                # the entropy decode ever validates a byte
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(
                    ">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            if progressive and not _init_progressive_frame(comps, h, w):
                return None
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None        # non-baseline/-progressive process
        elif marker == 0xDD:                    # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:                    # SOS
            if comps is None:
                return None
            ns = seg[0]
            if not progressive:
                sel = {}
                for c in range(ns):
                    cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    sel[cs] = (tt >> 4, tt & 0x0F)
                return _decode_scan(payload, i + seg_len, comps, sel,
                                    qts, huffs, h, w, restart_interval)
            nxt = _decode_progressive_scan(
                payload, i + seg_len, comps, seg, qts, huffs,
                restart_interval)
            if nxt is None:
                return None
            n_scans += 1
            i = nxt
            continue
        i += seg_len
    return None


def _init_progressive_frame(comps, h, w) -> bool:
    """Per-component geometry + int64 coefficient planes for a SOF2
    frame (coefficients ACCUMULATE across scans; dequant + IDCT run
    once at EOI). Returns False on bad sampling factors."""
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    if not (1 <= max_h <= 4 and 1 <= max_v <= 4):
        return False
    if any(c["h"] < 1 or c["v"] < 1 for c in comps):
        return False
    mcus_x = (w + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (h + 8 * max_v - 1) // (8 * max_v)
    for c in comps:
        c["bw"] = mcus_x * c["h"]
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        # non-interleaved scans iterate the component's TRUE block
        # grid (T.81 A.2.2), not the MCU-padded one
        cw = (w * c["h"] + max_h - 1) // max_h
        ch = (h * c["v"] + max_v - 1) // max_v
        c["nbw"] = (cw + 7) // 8
        c["nbh"] = (ch + 7) // 8
        c["pred"] = 0
    comps_meta = {"mcus_x": mcus_x, "mcus_y": mcus_y}
    comps[0]["_frame"] = comps_meta
    return True


def _refine_nonzero(br, coef, k, p1, m1):
    """One AC refinement correction bit for an existing nonzero
    coefficient (T.81 G.1.2.3): append the bit to the magnitude if
    not already present."""
    if br.read_bit():
        if (coef[k] & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else m1


def _decode_progressive_scan(data, pos, comps, seg, qts, huffs,
                             restart_interval):
    """Decode ONE progressive scan (T.81 G.2) into the frame's
    coefficient planes; returns the payload offset of the next marker
    (the byte holding its 0xFF), or None on a corrupt scan.

    Covers all four scan kinds: DC first (diff << Al, interleaved or
    single-component), DC refinement (one bit per block), AC first
    (spectral band [Ss..Se] with EOB runs), AC refinement (correction
    bits + EOB-run refinement). RSTn resets DC predictors and the EOB
    run every `restart_interval` MCUs."""
    ns = seg[0]
    if not 1 <= ns <= len(comps):
        return None
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
    by_id = {c["id"]: c for c in comps}
    scan_comps = []
    for c in range(ns):
        cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        comp = by_id.get(cs)
        if comp is None:
            return None
        td, ta = tt >> 4, tt & 0x0F
        scan_comps.append((comp, td, ta))
    # spectral-selection legality (G.1.1.1.1)
    dc_scan = ss == 0
    if dc_scan and se != 0:
        return None
    if not dc_scan and (ns != 1 or se > 63 or ss > se):
        return None
    if ah and ah != al + 1:
        return None                # refinements peel one bit at a time
    for comp, td, ta in scan_comps:
        if comp["tq"] not in qts:
            return None
        comp.setdefault("q", qts[comp["tq"]].astype(np.float64))
        if dc_scan and ah == 0:
            comp["dc_t"] = huffs.get(0x00 | td)
            if comp["dc_t"] is None:
                return None
        if not dc_scan:
            # AC-first and AC-refinement use the SAME table selector
            # (T.81 G.1.2.3: Td/Ta come from the scan header either
            # way) — one branch, so a selection fix can't land in
            # only one arm (r5 review)
            comp["ac_t"] = huffs.get(0x10 | ta)
            if comp["ac_t"] is None:
                return None
        if dc_scan and ah == 0:
            comp["pred"] = 0

    frame = comps[0]["_frame"]
    br = _BitReader(data, pos)
    state = {"eobrun": 0}

    def handle_restart(mcu_count):
        if restart_interval and mcu_count \
                and mcu_count % restart_interval == 0:
            br.align()
            p = br.pos
            if p + 1 < len(data) and data[p] == 0xFF \
                    and 0xD0 <= data[p + 1] <= 0xD7:
                br.pos = p + 2
            for comp, _, _ in scan_comps:
                comp["pred"] = 0
            state["eobrun"] = 0

    def decode_dc(comp, row):
        if ah == 0:
            t = _decode_huff(br, comp["dc_t"])
            if t is None or t > 11:
                # F.1.2.1.1: DC SSSS is 0..11 for 8-bit — a corrupt
                # table value would make receive() build an unbounded
                # int (fuzz-caught r5)
                return False
            comp["pred"] += _extend(br.receive(t), t)
            comp["coef"][row, 0] = comp["pred"] << al
        else:
            if br.read_bit():
                comp["coef"][row, 0] |= (1 << al)
        return True

    def decode_ac(comp, row):
        coef = comp["coef"][row]
        p1, m1 = 1 << al, -(1 << al)
        if ah == 0:                                # AC first scan
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return True
            k = ss
            while k <= se:
                rs = _decode_huff(br, comp["ac_t"])
                if rs is None:
                    return False
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:                    # ZRL
                        k += 16
                        continue
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += br.receive(r)
                    break                          # EOBn
                k += r
                if k > se:
                    return False
                coef[k] = _extend(br.receive(s), s) << al
                k += 1
            return True
        # AC refinement scan (G.1.2.3)
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _decode_huff(br, comp["ac_t"])
                if rs is None:
                    return False
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r != 15:
                        # EOBn: unlike the first-scan path, NO -1 here
                        # — the shared tail below refines the current
                        # block's remainder and decrements for it
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.receive(r)
                        break                      # fall through
                    # r == 15: ZRL — skip 16 zero-HISTORY coefficients
                else:
                    if s != 1:
                        return False
                    newval = p1 if br.read_bit() else m1
                while k <= se:
                    if coef[k] != 0:
                        _refine_nonzero(br, coef, k, p1, m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval:
                    if k > se:
                        return False
                    coef[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if coef[k] != 0:
                    _refine_nonzero(br, coef, k, p1, m1)
                k += 1
            state["eobrun"] -= 1
        return True

    if ns > 1:
        # interleaved (DC scans only per the legality check above):
        # MCU order over the padded grid, v x h blocks per component
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                handle_restart(my * frame["mcus_x"] + mx)
                for comp, _, _ in scan_comps:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            row = (my * comp["v"] + by) * comp["bw"] \
                                + (mx * comp["h"] + bx)
                            if not decode_dc(comp, row):
                                return None
    else:
        comp = scan_comps[0][0]
        # non-interleaved: raster over the component's true block
        # grid; one block per "MCU" for restart purposes (A.2.2)
        count = 0
        for by in range(comp["nbh"]):
            for bx in range(comp["nbw"]):
                handle_restart(count)
                count += 1
                row = by * comp["bw"] + bx
                ok = decode_dc(comp, row) if dc_scan \
                    else decode_ac(comp, row)
                if not ok:
                    return None

    # entropy data consumed: return the offset of the next marker
    p = max(br.pos, pos)
    while p + 1 < len(data):
        if data[p] != 0xFF:
            p += 1
            continue
        nxt = data[p + 1]
        if nxt == 0x00 or nxt == 0xFF or 0xD0 <= nxt <= 0xD7:
            p += 2 if nxt != 0xFF else 1
            continue
        return p
    return None                                   # ran off the end


def _decode_scan(data, pos, comps, sel, qts, huffs, h, w,
                 restart_interval):
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    if not (1 <= max_h <= 4 and 1 <= max_v <= 4):
        return None
    mcus_x = (w + 8 * max_h - 1) // (8 * max_h)
    mcus_y = (h + 8 * max_v - 1) // (8 * max_v)
    for c in comps:
        c["bw"] = mcus_x * c["h"]           # blocks across the plane
        c["bh"] = mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.float64)
        td, ta = sel[c["id"]]
        c["dc_t"] = huffs.get(0x00 | td)
        c["ac_t"] = huffs.get(0x10 | ta)
        if c["dc_t"] is None or c["ac_t"] is None \
                or c["tq"] not in qts:
            return None
        c["q"] = qts[c["tq"]].astype(np.float64)
        c["pred"] = 0

    br = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                br.align()
                p = br.pos
                if p + 1 < len(data) and data[p] == 0xFF \
                        and 0xD0 <= data[p + 1] <= 0xD7:
                    br.pos = p + 2
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        t = _decode_huff(br, c["dc_t"])
                        if t is None or t > 11:
                            return None    # F.1.2.1.1: DC SSSS <= 11
                        diff = _extend(br.receive(t), t)
                        c["pred"] += diff
                        zz = np.zeros(64, dtype=np.float64)
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, c["ac_t"])
                            if rs is None:
                                return None
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break           # EOB
                            k += r
                            if k > 63:
                                return None
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        row = (my * c["v"] + by) * c["bw"] \
                            + (mx * c["h"] + bx)
                        c["coef"][row] = zz
            mcu_count += 1

    return _idct_to_rgb(comps, h, w, max_h, max_v)


def _idct_to_rgb(comps, h, w, max_h, max_v):
    """Dequantize + batched IDCT + upsample + color convert — the
    shared tail of the baseline and progressive decode paths (the
    coefficient ACCUMULATION differs between processes, the sample
    reconstruction does not; T.81 A.3.3)."""
    planes = []
    for c in comps:
        nat = np.zeros((len(c["coef"]), 64), dtype=np.float64)
        nat[:, ZIGZAG] = c["coef"]
        nat *= c["q"][None, :]
        blocks = nat.reshape(-1, 8, 8)
        # batched IDCT: b = A.T @ F @ A for every block at once
        pix = np.einsum("ij,njk,kl->nil", _A.T, blocks, _A) + 128.0
        plane = (pix.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["bh"] * 8, c["bw"] * 8))
        # crop to this component's true size, then replicate up
        cw = (w * c["h"] + max_h - 1) // max_h
        ch = (h * c["v"] + max_v - 1) // max_v
        plane = plane[:ch, :cw]
        plane = np.repeat(np.repeat(plane, max_v // c["v"], axis=0),
                          max_h // c["h"], axis=1)[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
