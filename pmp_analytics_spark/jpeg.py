"""Stdlib baseline-JPEG codec (sequential DCT, Huffman).

Training corpora are JPEG-heavy, and this container has no pillow — so the
multimodal pipeline gets a real JPEG path the same way it got PNG and WAV
(see ``multimodal.py``): a from-the-spec implementation over ``struct`` +
pure Python, used only for the thumbnail-sized payloads that move through
``mapInPandas`` batches. Pillow remains the fast path when installed.

Decoder (``jpeg_decode``): baseline + extended-sequential Huffman JPEG
(SOF0/SOF1), 8-bit, 1 or 3 components, any h/v sampling factors ≤ 2
(4:4:4, 4:2:2, 4:2:0), restart intervals. Quantization and Huffman tables
are read from the FILE (DQT/DHT), not assumed, so real-world baseline
files decode — not just this encoder's output. Progressive (SOF2),
arithmetic coding, 12-bit, and hierarchical modes raise ``ValueError``
(pillow's job where installed).

Encoder (``jpeg_encode``): ITU T.81 Annex K quantization + Huffman
tables, quality scaling per the IJG curve, optional 4:2:0 subsampling and
restart intervals — options that exist mainly so the round-trip tests can
drive the decoder's interleaved-MCU, chroma-upsample, and restart-resync
paths without any third-party fixture generator.

Both ends speak the ``(width, height, rows)`` contract of the sibling
codecs: ``rows[y]`` is the y-th row TOP-DOWN as packed BGR bytes.

Reference corpus analog: none (the reference is tabular-only); this is
north-star multimodal surface, precedent set by the r5 PNG codec.
"""

from __future__ import annotations

import math
import struct

# Zigzag scan order: zigzag index -> natural (row*8+col) index.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU T.81 Annex K.1/K.2 quantization tables (natural order).
QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
] + [99] * 32

# Annex K.3 Huffman specs: (BITS[1..16], HUFFVAL).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)

# Orthonormal DCT-II basis: _C[u][x] = c(u)/2 * cos((2x+1)uπ/16), so the
# same matrix applies forward (FDCT) and, transposed, inverse (IDCT).
_C = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0) * 0.5 * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


def _fdct2(block: list[float]) -> list[float]:
    """8x8 forward DCT, natural order in/out (block[v*8+u])."""
    tmp = [0.0] * 64
    for r in range(8):  # 1-D over each row: spatial x -> freq u
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += _C[u][x] * block[r * 8 + x]
            tmp[r * 8 + u] = s
    out = [0.0] * 64
    for c in range(8):  # 1-D over each column: spatial y -> freq v
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += _C[v][y] * tmp[y * 8 + c]
            out[v * 8 + c] = s
    return out


def _idct2(block: list[float]) -> list[float]:
    """8x8 inverse DCT (transpose of ``_fdct2``'s basis application)."""
    tmp = [0.0] * 64
    for r in range(8):  # rows: freq u -> spatial x
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u][x] * block[r * 8 + u]
            tmp[r * 8 + x] = s
    out = [0.0] * 64
    for c in range(8):  # columns: freq v -> spatial y
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v][y] * tmp[v * 8 + c]
            out[y * 8 + c] = s
    return out


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(code_length, code) -> symbol, per T.81 C.2 canonical assignment."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over a de-stuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.data, self.pos, self.bit = data, 0, 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy segment")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.pos = 0, self.pos + 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` read bits to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(
    br: _BitReader, dc_tab: dict, ac_tab: dict, qt: list[int], pred: int
) -> tuple[list[float], int]:
    """One 8x8 block: Huffman -> dequantized natural-order coefficients."""
    coeffs = [0.0] * 64
    size = br.read_huff(dc_tab)
    diff = _extend(br.read_bits(size), size)
    dc = pred + diff
    coeffs[0] = dc * qt[0]
    k = 1
    while k < 64:
        rs = br.read_huff(ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        coeffs[ZIGZAG[k]] = _extend(br.read_bits(size), size) * qt[ZIGZAG[k]]
        k += 1
    return coeffs, dc


def jpeg_decode(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a baseline/extended-sequential Huffman JPEG to
    ``(width, height, rows)``, rows top-down packed BGR (grayscale
    replicates Y into all three channels). ValueError on anything that
    is not an 8-bit sequential-Huffman JPEG."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None  # (w, h, components)
    restart = 0
    try:
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("JPEG marker expected")
            # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before
            # the marker code byte.
            while pos + 2 < len(payload) and payload[pos + 1] == 0xFF:
                pos += 1
            marker = payload[pos + 1]
            pos += 2
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                continue
            (seglen,) = struct.unpack_from(">H", payload, pos)
            seg = payload[pos + 2 : pos + seglen]
            pos += seglen
            if marker == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 0x0F
                    p += 1
                    if pq:
                        vals = list(struct.unpack_from(f">{64}H", seg, p))
                        p += 128
                    else:
                        vals = list(seg[p : p + 64])
                        p += 64
                    nat = [0] * 64
                    for zz, q in enumerate(vals):
                        nat[ZIGZAG[zz]] = q
                    qts[tq] = nat
            elif marker == 0xC4:  # DHT
                p = 0
                while p < len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 0x0F
                    bits = list(seg[p + 1 : p + 17])
                    n = sum(bits)
                    vals = list(seg[p + 17 : p + 17 + n])
                    (ac_tabs if tc else dc_tabs)[th] = _build_decode_table(bits, vals)
                    p += 17 + n
            elif marker in (0xC0, 0xC1):  # SOF0/SOF1
                prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
                if prec != 8:
                    raise ValueError("only 8-bit JPEG is supported")
                comps = []
                for i in range(nc):
                    cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
                frame = (w, h, comps)
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise ValueError(
                    "only baseline/extended sequential Huffman JPEG decodes "
                    "stdlib-side (progressive/arithmetic need pillow)"
                )
            elif marker == 0xDD:  # DRI
                (restart,) = struct.unpack_from(">H", seg, 0)
            elif marker == 0xDA:  # SOS
                if frame is None:
                    raise ValueError("JPEG SOS before SOF")
                ns = seg[0]
                scan = []
                for i in range(ns):
                    cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                    comp = next(c for c in frame[2] if c["id"] == cs)
                    scan.append((comp, tdta >> 4, tdta & 0x0F))
                if ns < len(frame[2]):
                    # Non-interleaved baseline (one scan per component):
                    # decoding only the first (Y) scan would silently
                    # return a desaturated image, so reject honestly.
                    raise ValueError(
                        "non-interleaved multi-scan JPEG needs pillow"
                    )
                return _decode_scan(payload, pos, frame, scan, qts, dc_tabs, ac_tabs, restart)
        raise ValueError("JPEG has no SOS marker")
    except (struct.error, IndexError, StopIteration, KeyError) as e:
        # KeyError: a scan referencing a DQT/DHT table id that was never
        # defined (stripped/truncated tables) — corrupt, not a crash.
        raise ValueError(f"corrupt JPEG payload: {e}") from e


def _decode_scan(payload, pos, frame, scan, qts, dc_tabs, ac_tabs, restart):
    w, h, comps = frame
    if w <= 0 or h <= 0:
        raise ValueError("degenerate JPEG dimensions")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise ValueError("only sampling factors 1-2 are supported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # De-stuff the entropy stream, splitting on RST markers: each segment
    # restarts byte-aligned with fresh DC predictors (T.81 F.2.1.3.1).
    segments, cur = [], bytearray()
    while pos + 1 < len(payload):
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = payload[pos + 1]
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or the next real marker ends the scan
            break
    segments.append(bytes(cur))

    planes = {}
    for comp, _, _ in scan:
        planes[comp["id"]] = [
            bytearray(mcux * comp["h"] * 8) for _ in range(mcuy * comp["v"] * 8)
        ]
    preds = {comp["id"]: 0 for comp, _, _ in scan}
    seg_i = 0
    br = _BitReader(segments[0])
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("missing JPEG restart segment")
            br = _BitReader(segments[seg_i])
            preds = {comp["id"]: 0 for comp, _, _ in scan}
        my, mx = divmod(m, mcux)
        for comp, td, ta in scan:
            ch, cv, qt = comp["h"], comp["v"], qts[comp["tq"]]
            for by in range(cv):
                for bx in range(ch):
                    coeffs, preds[comp["id"]] = _decode_block(
                        br, dc_tabs[td], ac_tabs[ta], qt, preds[comp["id"]]
                    )
                    pix = _idct2(coeffs)
                    plane = planes[comp["id"]]
                    ox = (mx * ch + bx) * 8
                    oy = (my * cv + by) * 8
                    for y in range(8):
                        row = plane[oy + y]
                        base = y * 8
                        for x in range(8):
                            v = int(pix[base + x] + 128.5)
                            row[ox + x] = 0 if v < 0 else (255 if v > 255 else v)

    rows: list[bytes] = []
    if len(scan) == 1:
        plane = planes[scan[0][0]["id"]]
        for y in range(h):
            line = plane[y]
            rows.append(bytes(b for x in range(w) for b in (line[x], line[x], line[x])))
        return w, h, rows
    cy, cb, cr = (planes[c["id"]] for c, _, _ in scan)
    sy = next(c for c, _, _ in scan)
    hy, vy = sy["h"], sy["v"]
    hb = [c["h"] for c, _, _ in scan]
    vb = [c["v"] for c, _, _ in scan]
    out = bytearray(3 * w)
    for y in range(h):
        ly = cy[y * vy // vmax]
        lb = cb[y * vb[1] // vmax]
        lr = cr[y * vb[2] // vmax]
        for x in range(w):
            Y = ly[x * hy // hmax]
            Cb = lb[x * hb[1] // hmax] - 128
            Cr = lr[x * hb[2] // hmax] - 128
            r = Y + 1.402 * Cr
            g = Y - 0.344136 * Cb - 0.714136 * Cr
            b = Y + 1.772 * Cb
            out[3 * x] = 0 if b < 0 else (255 if b > 255 else int(b + 0.5))
            out[3 * x + 1] = 0 if g < 0 else (255 if g > 255 else int(g + 0.5))
            out[3 * x + 2] = 0 if r < 0 else (255 if r > 255 else int(r + 0.5))
        rows.append(bytes(out))
    return w, h, rows


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out, self.acc, self.nbits = bytearray(), 0, 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad with 1s


def _csize(v: int) -> int:
    """Coefficient magnitude category (bit size)."""
    return 0 if v == 0 else abs(v).bit_length()


def _scaled_qt(base: list[int], quality: int) -> list[int]:
    """IJG quality scaling: 50 -> spec tables, 100 -> near-lossless."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (q * s + 50) // 100)) for q in base]


def _encode_block(
    wtr: _BitWriter, samples: list[float], qt: list[int],
    dc_tab: dict, ac_tab: dict, pred: int,
) -> int:
    coeffs = _fdct2(samples)
    q = [int(round(coeffs[ZIGZAG[zz]] / qt[ZIGZAG[zz]])) for zz in range(64)]
    diff = q[0] - pred
    size = _csize(diff)
    code, length = dc_tab[size]
    wtr.write(code, length)
    if size:
        wtr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = max((zz for zz in range(1, 64) if q[zz]), default=0)
    for zz in range(1, last_nz + 1):
        if q[zz] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            wtr.write(code, length)
            run -= 16
        size = _csize(q[zz])
        code, length = ac_tab[(run << 4) | size]
        wtr.write(code, length)
        v = q[zz]
        wtr.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_tab[0x00]  # EOB
        wtr.write(code, length)
    return q[0]


def _plane_block(plane: list[list[float]], ox: int, oy: int) -> list[float]:
    """8x8 block at (ox, oy), edge-replicated past the plane bounds."""
    h, w = len(plane), len(plane[0])
    out = []
    for y in range(8):
        row = plane[min(oy + y, h - 1)]
        for x in range(8):
            out.append(row[min(ox + x, w - 1)])
    return out


def jpeg_encode(
    width: int,
    height: int,
    rows: list[bytes],
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode top-down packed-BGR rows as a baseline JFIF JPEG
    (Annex K tables at the given quality; 4:2:0 when ``subsample``,
    4:4:4 otherwise; optional DRI restart markers)."""
    if width <= 0 or height <= 0 or len(rows) != height:
        raise ValueError("bad image geometry")
    qt_l = _scaled_qt(QT_LUMA, quality)
    qt_c = _scaled_qt(QT_CHROMA, quality)
    # Planes as float, level-shifted by -128 (T.81 A.3.1).
    yp = [[0.0] * width for _ in range(height)]
    cbp = [[0.0] * width for _ in range(height)]
    crp = [[0.0] * width for _ in range(height)]
    for y in range(height):
        row = rows[y]
        if len(row) != 3 * width:
            raise ValueError("row length mismatch")
        yr, cbr, crr = yp[y], cbp[y], crp[y]
        for x in range(width):
            b, g, r = row[3 * x], row[3 * x + 1], row[3 * x + 2]
            yr[x] = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
            cbr[x] = -0.168736 * r - 0.331264 * g + 0.5 * b
            crr[x] = 0.5 * r - 0.418688 * g - 0.081312 * b
    if subsample:
        # 2x2 box average for the chroma planes.
        cw, chh = (width + 1) // 2, (height + 1) // 2
        def shrink(p):
            out = [[0.0] * cw for _ in range(chh)]
            for y in range(chh):
                for x in range(cw):
                    acc, n = 0.0, 0
                    for dy in (0, 1):
                        for dx in (0, 1):
                            yy, xx = 2 * y + dy, 2 * x + dx
                            if yy < height and xx < width:
                                acc += p[yy][xx]
                                n += 1
                    out[y][x] = acc / n
            return out
        cbp, crp = shrink(cbp), shrink(crp)
        hv = [(2, 2), (1, 1), (1, 1)]
    else:
        hv = [(1, 1), (1, 1), (1, 1)]
    hmax = max(h for h, _ in hv)
    vmax = max(v for _, v in hv)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    dc_l = _build_encode_table(*HUFF_DC_LUMA)
    ac_l = _build_encode_table(*HUFF_AC_LUMA)
    dc_c = _build_encode_table(*HUFF_DC_CHROMA)
    ac_c = _build_encode_table(*HUFF_AC_CHROMA)
    planes = [yp, cbp, crp]
    qts = [qt_l, qt_c, qt_c]
    dcs = [dc_l, dc_c, dc_c]
    acs = [ac_l, ac_c, ac_c]

    scan = bytearray()
    wtr = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            scan += wtr.out
            scan += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            wtr = _BitWriter()
            preds = [0, 0, 0]
        my, mx = divmod(m, mcux)
        for ci in range(3):
            ch, cv = hv[ci]
            for by in range(cv):
                for bx in range(ch):
                    block = _plane_block(
                        planes[ci], (mx * ch + bx) * 8, (my * cv + by) * 8
                    )
                    preds[ci] = _encode_block(
                        wtr, block, qts[ci], dcs[ci], acs[ci], preds[ci]
                    )
    wtr.flush()
    scan += wtr.out

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tq: int, qt: list[int]) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(qt[ZIGZAG[zz]] for zz in range(64)))

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + b"".join(
            struct.pack(">BBB", i + 1, (hv[i][0] << 4) | hv[i][1], 0 if i == 0 else 1)
            for i in range(3)
        ),
    )
    # Component i uses DC/AC table pair 0 (luma) or 1 (chroma).
    sos = seg(
        0xDA,
        bytes([3])
        + b"".join(bytes([i + 1, 0x00 if i == 0 else 0x11]) for i in range(3))
        + bytes([0, 63, 0]),
    )
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qt_l) + dqt(1, qt_c)
    out += sof
    out += dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, HUFF_AC_LUMA)
    out += dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += sos + scan + b"\xff\xd9"
    return bytes(out)
