"""Stdlib baseline-JPEG codec (sequential DCT, Huffman).

Training corpora are JPEG-heavy, and this container has no pillow — so the
multimodal pipeline gets a real JPEG path the same way it got PNG and WAV
(see ``multimodal.py``): a from-the-spec implementation over ``struct`` +
pure Python, used only for the thumbnail-sized payloads that move through
``mapInPandas`` batches. Pillow remains the fast path when installed.

Decoder (``jpeg_decode``): baseline + extended-sequential (SOF0/SOF1)
AND progressive (SOF2) Huffman JPEG — spectral selection, successive
approximation (DC and AC first + refinement passes), EOB runs, the
dominant web-crawl variant — 8-bit, 1 or 3 components, any h/v sampling
factors ≤ 2 (4:4:4, 4:2:2, 4:2:0), restart intervals. Quantization and
Huffman tables are read from the FILE (DQT/DHT), not assumed, so
real-world files decode — not just this encoder's output. Arithmetic
coding, 12-bit, lossless, and hierarchical modes raise ``ValueError``
(pillow's job where installed).

Encoders: ``jpeg_encode`` (baseline — ITU T.81 Annex K quantization +
Huffman tables, quality scaling per the IJG curve, optional 4:2:0
subsampling and restart intervals) and ``jpeg_encode_progressive``
(SOF2, the classic DC-first/refine + split-AC-band + AC-refine scan
script) — both exist mainly so the round-trip tests can drive every
decoder path without any third-party fixture generator.

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


def _prog_units(scan, frame):
    """Restart-unit traversal of one progressive scan: yields one MCU
    (interleaved scan) or one block (single-component scan — T.81
    A.2.2: its own true ceil(dims/8) grid, not the MCU-padded one) per
    step, as a list of (comp, td, ta, (by, bx))."""
    mcux, mcuy, hmax, vmax = _dims_of(frame)
    w, h, _ = frame
    if len(scan) == 1:
        comp, td, ta = scan[0]
        cw = (w * comp["h"] + hmax - 1) // hmax
        chh = (h * comp["v"] + vmax - 1) // vmax
        bw, bh = (cw + 7) // 8, (chh + 7) // 8
        for by in range(bh):
            for bx in range(bw):
                yield [(comp, td, ta, (by, bx))]
    else:
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            yield [
                (comp, td, ta, (my * comp["v"] + by, mx * comp["h"] + bx))
                for comp, td, ta in scan
                for by in range(comp["v"])
                for bx in range(comp["h"])
            ]


def _refine_nonzero(br, blk, k, p1):
    """One AC-refinement correction bit on a nonzero-history coefficient
    (T.81 G.1.2.3): move magnitude one level toward the true value."""
    if br.read_bit():
        if blk[k] >= 0:
            if blk[k] & p1 == 0:
                blk[k] += p1
        else:
            if (-blk[k]) & p1 == 0:
                blk[k] -= p1


def _decode_prog_scan(
    segments, frame, scan, ss, se, ah, al, coeff, dc_tabs, ac_tabs, restart
):
    """Apply one progressive scan to the zigzag coefficient buffers.

    DC scans (ss == 0): first pass (ah == 0) decodes Huffman DC diffs at
    point transform ``al``; refinements append one bit per block. AC
    scans are single-component; the first pass carries EOB runs, the
    refinement pass is the T.81 G.1.2.3 correction-bit walk (new
    coefficients enter at ±2^al, every nonzero-history coefficient on
    the path consumes a correction bit, EOB runs keep consuming
    correction bits through the skipped blocks)."""
    if ss == 0 and se != 0:
        # T.81 B.2.3: a DC scan has Ss = Se = 0; a spectral range that
        # includes 0 alongside AC coefficients is not legal
        raise ValueError("progressive scan mixes DC and AC coefficients")
    if ss > 0 and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    seg_i, br = 0, _BitReader(segments[0])
    preds = {comp["id"]: 0 for comp, _, _ in scan}
    eobrun = 0
    p1 = 1 << al
    for n, unit in enumerate(_prog_units(scan, frame)):
        if restart and n and n % restart == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("missing JPEG restart segment")
            br = _BitReader(segments[seg_i])
            preds = {comp["id"]: 0 for comp, _, _ in scan}
            eobrun = 0
        for comp, td, ta, (by, bx) in unit:
            blk = coeff[comp["id"]][by][bx]
            if ss == 0:
                if ah == 0:
                    size = br.read_huff(dc_tabs[td])
                    diff = _extend(br.read_bits(size), size)
                    preds[comp["id"]] += diff
                    blk[0] = preds[comp["id"]] << al
                elif br.read_bit():
                    blk[0] |= p1
            elif ah == 0:  # AC first pass
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.read_huff(ac_tabs[ta])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC run past spectral band")
                    blk[k] = _extend(br.read_bits(s), s) << al
                    k += 1
            else:  # AC refinement pass (T.81 G.1.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = br.read_huff(ac_tabs[ta])
                        r, s = rs >> 4, rs & 0x0F
                        val = 0
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            # r == 15: pass 16 zero-history coefficients
                        elif s != 1:
                            raise ValueError(
                                "invalid JPEG AC refinement magnitude"
                            )
                        else:
                            val = p1 if br.read_bit() else -p1
                        while k <= se:
                            if blk[k] != 0:
                                _refine_nonzero(br, blk, k, p1)
                            else:
                                if r == 0:
                                    if val:
                                        blk[k] = val
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    while k <= se:
                        if blk[k] != 0:
                            _refine_nonzero(br, blk, k, p1)
                        k += 1
                    eobrun -= 1


def _dims_of(frame):
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return mcux, mcuy, hmax, vmax


def _assemble_progressive(frame, coeff, qts):
    """Dequantize + IDCT every accumulated coefficient block into
    component planes, then the shared upsample/color back half."""
    w, h, comps = frame
    mcux, mcuy, hmax, vmax = _dims_of(frame)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise ValueError("only sampling factors 1-2 are supported")
    planes = {}
    for comp in comps:
        qt = qts[comp["tq"]]
        blocks = coeff[comp["id"]]
        plane = [
            bytearray(mcux * comp["h"] * 8)
            for _ in range(mcuy * comp["v"] * 8)
        ]
        for by, brow in enumerate(blocks):
            for bx, blk in enumerate(brow):
                nat = [0.0] * 64
                for zz in range(64):
                    nat[ZIGZAG[zz]] = blk[zz] * qt[ZIGZAG[zz]]
                pix = _idct2(nat)
                ox, oy = bx * 8, by * 8
                for y in range(8):
                    row = plane[oy + y]
                    base = y * 8
                    for x in range(8):
                        v = int(pix[base + x] + 128.5)
                        row[ox + x] = 0 if v < 0 else (255 if v > 255 else v)
        planes[comp["id"]] = plane
    return _planes_to_rows(w, h, comps, planes, hmax, vmax)


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
    progressive = False
    coeff = None  # comp_id -> [by][bx] -> 64 zigzag-order quantized ints
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
            if marker == 0xD9:  # EOI (no length segment)
                break
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
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
                prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
                if prec != 8:
                    raise ValueError("only 8-bit JPEG is supported")
                comps = []
                for i in range(nc):
                    cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
                frame = (w, h, comps)
                progressive = marker == 0xC2
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise ValueError(
                    "only sequential/progressive Huffman JPEG decodes "
                    "stdlib-side (arithmetic/lossless/hierarchical need pillow)"
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
                if not progressive:
                    if ns < len(frame[2]):
                        # Non-interleaved baseline (one scan per comp):
                        # decoding only the first (Y) scan would silently
                        # return a desaturated image, so reject honestly.
                        raise ValueError(
                            "non-interleaved multi-scan JPEG needs pillow"
                        )
                    return _decode_scan(
                        payload, pos, frame, scan, qts, dc_tabs, ac_tabs, restart
                    )
                ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
                if coeff is None:
                    mcux, mcuy, _, _ = _dims_of(frame)
                    coeff = {
                        c["id"]: [
                            [[0] * 64 for _ in range(mcux * c["h"])]
                            for _ in range(mcuy * c["v"])
                        ]
                        for c in frame[2]
                    }
                segments, pos = _entropy_segments(payload, pos)
                _decode_prog_scan(
                    segments, frame, scan, ss, se, ahal >> 4, ahal & 0x0F,
                    coeff, dc_tabs, ac_tabs, restart,
                )
        if progressive and coeff is not None:
            return _assemble_progressive(frame, coeff, qts)
        raise ValueError("JPEG has no SOS marker")
    except (struct.error, IndexError, StopIteration, KeyError) as e:
        # KeyError: a scan referencing a DQT/DHT table id that was never
        # defined (stripped/truncated tables) — corrupt, not a crash.
        raise ValueError(f"corrupt JPEG payload: {e}") from e


def _entropy_segments(payload, pos):
    """De-stuff one scan's entropy stream, splitting on RST markers:
    each segment restarts byte-aligned with fresh DC predictors (T.81
    F.2.1.3.1). Returns (segments, position of the next real marker)."""
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
    return segments, pos


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

    segments, _ = _entropy_segments(payload, pos)

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

    return _planes_to_rows(w, h, [c for c, _, _ in scan], planes, hmax, vmax)


def _planes_to_rows(w, h, comps, planes, hmax, vmax):
    """Upsample + color-convert decoded component planes to the
    ``(width, height, rows)`` BGR contract — shared by the baseline and
    progressive back halves."""
    rows: list[bytes] = []
    if len(comps) == 1:
        plane = planes[comps[0]["id"]]
        for y in range(h):
            line = plane[y]
            rows.append(bytes(b for x in range(w) for b in (line[x], line[x], line[x])))
        return w, h, rows
    cy, cb, cr = (planes[c["id"]] for c in comps)
    sy = comps[0]
    hy, vy = sy["h"], sy["v"]
    hb = [c["h"] for c in comps]
    vb = [c["v"] for c in comps]
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


# ---------------------------------------------------------------------------
# Progressive encoder (fixture-grade: exists so the round-trip tests can
# drive the progressive decoder's DC/AC first+refinement, EOB-run, ZRL,
# and restart paths without any third-party generator — the same reason
# the baseline encoder exists).
# ---------------------------------------------------------------------------

# Flat canonical tables that can encode EVERY progressive symbol the
# scans below emit (Annex K's AC tables lack the EOBn codes (r<<4)|0 for
# r >= 1, so they cannot express EOB runs > 1): 12 DC categories at 4
# bits; 15 EOBn + ZRL + 16x10 run/size at 8 bits (226 < 255 codes, so
# the all-ones code stays unused as T.81 requires).
HUFF_DC_PROG = ([0, 0, 0, 12] + [0] * 12, list(range(12)))
HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176] + [0] * 8,
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)],
)


def _pt_dc(v: int, al: int) -> int:
    return v >> al  # arithmetic shift (T.81 A.4: DC point transform)


def _pt_ac(v: int, al: int) -> int:
    a = abs(v) >> al  # magnitude shift, sign preserved (AC point transform)
    return -a if v < 0 else a


class _ProgWriter:
    """Bit writer + EOB-run state for one progressive scan."""

    def __init__(self, ac_tab):
        self.w = _BitWriter()
        self.ac = ac_tab
        self.eobrun = 0
        self.be: list[int] = []  # correction bits buffered behind the run

    def flush_eobrun(self):
        n = self.eobrun
        if n == 0:
            return
        r = n.bit_length() - 1
        code, length = self.ac[r << 4]
        self.w.write(code, length)
        if r:
            self.w.write(n - (1 << r), r)
        for b in self.be:
            self.w.write(b, 1)
        self.eobrun, self.be = 0, []

    def end_block(self, tail_bits):
        self.eobrun += 1
        self.be.extend(tail_bits)
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()


def _enc_ac_first(pw: _ProgWriter, blk, ss, se, al):
    t = {zz: _pt_ac(blk[zz], al) for zz in range(ss, se + 1)}
    last = max((zz for zz in t if t[zz]), default=None)
    if last is None:
        pw.end_block([])
        return
    pw.flush_eobrun()
    run = 0
    for zz in range(ss, last + 1):
        v = t[zz]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = pw.ac[0xF0]
            pw.w.write(code, length)
            run -= 16
        s = _csize(v)
        code, length = pw.ac[(run << 4) | s]
        pw.w.write(code, length)
        pw.w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < se:
        pw.end_block([])


def _enc_ac_refine(pw: _ProgWriter, blk, ss, se, al):
    """Mirror of the decoder's G.1.2.3 walk, via an explicit pending
    queue: zeros and correction bits accumulate IN COEFFICIENT ORDER; a
    ZRL consumes exactly 16 pending zeros (emitting the correction bits
    interleaved before its 16th zero — the decoder's walk stops there);
    a new-significant coefficient emits its run/size + sign + every
    remaining pending correction bit; a block tail becomes an EOB-run
    entry with its correction bits buffered behind the run."""
    pending: list = []  # 'z' | ('c', bit), in zigzag order
    for zz in range(ss, se + 1):
        t = _pt_ac(blk[zz], al)
        if t == 0:
            pending.append("z")
        elif abs(t) > 1:
            pending.append(("c", abs(t) & 1))
        else:
            pw.flush_eobrun()
            while sum(1 for p in pending if p == "z") > 15:
                code, length = pw.ac[0xF0]
                pw.w.write(code, length)
                zeros = 0
                while zeros < 16:
                    p = pending.pop(0)
                    if p == "z":
                        zeros += 1
                    else:
                        pw.w.write(p[1], 1)
            run = sum(1 for p in pending if p == "z")
            code, length = pw.ac[(run << 4) | 1]
            pw.w.write(code, length)
            pw.w.write(1 if t > 0 else 0, 1)
            for p in pending:
                if p != "z":
                    pw.w.write(p[1], 1)
            pending = []
    if pending:
        pw.end_block([p[1] for p in pending if p != "z"])


def _encode_prog_scan(
    scan, frame, grids, dc_tabs, ss, se, ah, al, restart
) -> bytes:
    """Entropy bytes (with RST markers) of one progressive scan over the
    quantized coefficient grids; ``scan`` = [(comp, dc_tab_id, ac_tab)]
    mirroring the decoder's traversal exactly."""
    out = bytearray()
    pw = _ProgWriter(scan[0][2])
    preds = {comp["id"]: 0 for comp, _, _ in scan}
    rst = 0
    for n, unit in enumerate(_prog_units(scan, frame)):
        if restart and n and n % restart == 0:
            pw.flush_eobrun()
            pw.w.flush()
            out += pw.w.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pw = _ProgWriter(scan[0][2])
            preds = {comp["id"]: 0 for comp, _, _ in scan}
        for comp, _td, _ta, (by, bx) in unit:
            blk = grids[comp["id"]][by][bx]
            if ss == 0:
                if ah == 0:
                    v = _pt_dc(blk[0], al)
                    diff = v - preds[comp["id"]]
                    preds[comp["id"]] = v
                    s = _csize(diff)
                    code, length = dc_tabs[comp["id"]][s]
                    pw.w.write(code, length)
                    if s:
                        pw.w.write(
                            diff if diff >= 0 else diff + (1 << s) - 1, s
                        )
                else:
                    pw.w.write((blk[0] >> al) & 1, 1)
            elif ah == 0:
                _enc_ac_first(pw, blk, ss, se, al)
            else:
                _enc_ac_refine(pw, blk, ss, se, al)
    pw.flush_eobrun()
    pw.w.flush()
    out += pw.w.out
    return bytes(out)


def jpeg_encode_progressive(
    width: int,
    height: int,
    rows: list[bytes],
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode top-down packed-BGR rows as a PROGRESSIVE (SOF2) JFIF
    JPEG: spectral selection + successive approximation with the
    classic scan script — interleaved DC first (Al=1) and refinement,
    per-component AC bands 1-5 and 6-63 at Al=1, then per-component AC
    refinements to Al=0. Same plane/DCT/quantization front end as
    ``jpeg_encode``; decodes bit-exactly to the same pixels as the
    baseline encoding of the same input (pinned in tests)."""
    if width <= 0 or height <= 0 or len(rows) != height:
        raise ValueError("bad image geometry")
    qt_l = _scaled_qt(QT_LUMA, quality)
    qt_c = _scaled_qt(QT_CHROMA, quality)
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
    comps = [
        {"id": i + 1, "h": hv[i][0], "v": hv[i][1], "tq": 0 if i == 0 else 1}
        for i in range(3)
    ]
    frame = (width, height, comps)
    mcux, mcuy, hmax, vmax = _dims_of(frame)

    planes = [yp, cbp, crp]
    qts = [qt_l, qt_c, qt_c]
    grids: dict[int, list] = {}
    for ci, comp in enumerate(comps):
        ch, cv = comp["h"], comp["v"]
        grid = []
        for by in range(mcuy * cv):
            row_blocks = []
            for bx in range(mcux * ch):
                block = _plane_block(planes[ci], bx * 8, by * 8)
                coeffs = _fdct2(block)
                row_blocks.append(
                    [
                        int(round(coeffs[ZIGZAG[zz]] / qts[ci][ZIGZAG[zz]]))
                        for zz in range(64)
                    ]
                )
            grid.append(row_blocks)
        grids[comp["id"]] = grid

    dc_enc = _build_encode_table(*HUFF_DC_PROG)
    ac_enc = _build_encode_table(*HUFF_AC_PROG)
    dc_by_id = {c["id"]: dc_enc for c in comps}

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos_hdr(comp_sel, ss, se, ah, al):
        return seg(
            0xDA,
            bytes([len(comp_sel)])
            + b"".join(bytes([c["id"], 0x00]) for c in comp_sel)
            + bytes([ss, se, (ah << 4) | al]),
        )

    # the classic scan script: DC first+refine interleaved, split AC
    # bands at Al=1 per component, then full-band AC refinements
    script = [(comps, 0, 0, 0, 1), (comps, 0, 0, 1, 0)]
    for c in comps:
        script += [([c], 1, 5, 0, 1), ([c], 6, 63, 0, 1)]
    for c in comps:
        script += [([c], 1, 63, 1, 0)]

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(
        0xDB, bytes([0]) + bytes(qt_l[ZIGZAG[zz]] for zz in range(64))
    )
    out += seg(
        0xDB, bytes([1]) + bytes(qt_c[ZIGZAG[zz]] for zz in range(64))
    )
    out += seg(
        0xC2,
        struct.pack(">BHHB", 8, height, width, 3)
        + b"".join(
            struct.pack(
                ">BBB", c["id"], (c["h"] << 4) | c["v"], c["tq"]
            )
            for c in comps
        ),
    )
    bits, vals = HUFF_DC_PROG
    out += seg(0xC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    bits, vals = HUFF_AC_PROG
    out += seg(0xC4, bytes([0x10]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for comp_sel, ss, se, ah, al in script:
        scan = [(c, 0, ac_enc) for c in comp_sel]
        out += sos_hdr(comp_sel, ss, se, ah, al)
        out += _encode_prog_scan(
            scan, frame, grids, dc_by_id, ss, se, ah, al, restart_interval
        )
    out += b"\xff\xd9"
    return bytes(out)
