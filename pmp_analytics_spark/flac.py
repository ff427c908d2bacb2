"""Stdlib FLAC codec — decoder + fixture-grade encoder.

Completes the audio surface the way webp.py completed images: FLAC is a
fully-published spec (https://xiph.org/flac/format.html, RFC 9639)
implementable with pure ``struct``/integer arithmetic — no DSP library.
MP3 remains an honest reject in ``multimodal.decode_audio`` (psychoacoustic
synthesis needs a real DSP stack).

Decoder scope (the full fixed-blocksize surface a real encoder emits):

- STREAMINFO metadata block (other block types skipped by length);
- frame headers: sync + blocking strategy, tabled/uncommon block sizes,
  tabled/STREAMINFO/explicit sample rates, all channel assignments
  (independent, left/side, right/side, mid/side), tabled sample sizes,
  UTF-8-style coded frame numbers, CRC-8 VERIFIED;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC any order with
  quantized coefficients, wasted-bits unary prefix;
- residuals: 4-bit (method 0) and 5-bit (method 1) partitioned Rice,
  any partition order, escape partitions (raw two's-complement bits);
- stereo decorrelation inverses (side channel at bps+1 bits);
- frame footer CRC-16 VERIFIED.

Encoder scope (fixtures + round-trip tests, not a compressor): every
decoder path above is reachable via explicit knobs — subframe type,
stereo mode, Rice partition order, forced escape partitions, wasted
bits, sample-rate/block-size header codes — so tests can pin each
branch with payloads built here and decoded by the decoder.

Reference analogue: none (the reference has no media surface); this is
north-star multimodal plumbing. The distributed shape is unchanged:
payloads decode inside mapInPandas batches (see queries/analytic.py's
audio family), never on the driver.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# bit I/O (MSB-first, the FLAC bit order)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        d, p = self.data, self.pos
        if p + n > len(d) * 8:
            raise ValueError("flac: truncated bitstream")
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and (v >> (n - 1)) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        if self.pos & 7:
            raise ValueError("flac: unaligned byte_pos")
        return self.pos >> 3


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        value &= (1 << n) - 1 if n else 0
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        if self.nbits:
            raise ValueError("flac: unaligned writer")
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# CRCs (frame-header CRC-8 poly 0x07, frame CRC-16 poly 0x8005, init 0)
# ---------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# ---------------------------------------------------------------------------
# header code tables
# ---------------------------------------------------------------------------

_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_RATE_CODES = {v: k for k, v in _SAMPLE_RATES.items()}
_BITS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}
_BITS_CODES = {v: k for k, v in _BITS.items()}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else (-(r << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_utf8_number(r: _BitReader) -> int:
    """FLAC's UTF-8-style coded number (frame/sample index, up to 36
    bits — an extended UTF-8 allowing 7-byte sequences)."""
    first = r.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("flac: invalid coded number")
    v = first & (mask - 1)
    for _ in range(n_follow):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("flac: invalid coded-number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _decode_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    porder = r.read(4)
    n_part = 1 << porder
    if block_size % n_part:
        raise ValueError("flac: block size not divisible by partitions")
    out: list[int] = []
    for part in range(n_part):
        count = block_size // n_part - (order if part == 0 else 0)
        if count < 0:
            raise ValueError("flac: predictor order exceeds first partition")
        param = r.read(param_bits)
        if param == escape:
            raw = r.read(5)
            out.extend(r.read_signed(raw) if raw else 0 for _ in range(count))
        else:
            for _ in range(count):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                out.append(_unzigzag(u))
    return out


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("flac: subframe padding bit set")
    sf_type = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if sf_type == 0:  # CONSTANT
        samples = [r.read_signed(eff)] * block_size
    elif sf_type == 1:  # VERBATIM
        samples = [r.read_signed(eff) for _ in range(block_size)]
    elif 8 <= sf_type <= 12:  # FIXED
        order = sf_type & 0x07
        samples = [r.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(r, block_size, order)
        coefs = _FIXED_COEFS[order]
        for e in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(pred + e)
    elif sf_type >= 0x20:  # LPC
        order = (sf_type & 0x1F) + 1
        samples = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 0xF:
            raise ValueError("flac: invalid LPC precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(r, block_size, order)
        for e in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs)) >> shift
            samples.append(pred + e)
    else:
        raise ValueError(f"flac: reserved subframe type {sf_type:#04x}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def flac_decode(payload: bytes) -> dict:
    """Decode a FLAC payload to the ``_wav_decode`` dict contract:
    ``{channels, sample_rate, bits, n_frames, samples}`` with
    ``samples`` interleaved ints. CRC-8 (frame header) and CRC-16
    (whole frame) are verified — a corrupt payload raises, it does not
    return wrong audio."""
    if len(payload) < 42 or payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("flac: truncated metadata")
        hdr = payload[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:
            if blen != 34:
                raise ValueError("flac: bad STREAMINFO length")
            r = _BitReader(body)
            r.read(16)  # min block size
            r.read(16)  # max block size
            r.read(24)  # min frame size
            r.read(24)  # max frame size
            rate = r.read(20)
            channels = r.read(3) + 1
            bits = r.read(5) + 1
            total = r.read(36)
            streaminfo = (rate, channels, bits, total)
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("flac: missing STREAMINFO")
    si_rate, si_channels, si_bits, si_total = streaminfo

    chans: list[list[int]] = [[] for _ in range(si_channels)]
    n_frames = 0
    while pos < len(payload):
        frame_start = pos
        r = _BitReader(payload, pos * 8)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy (coded number disambiguates)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 0:
            rate = si_rate
        elif sr_code in _SAMPLE_RATES:
            rate = _SAMPLE_RATES[sr_code]
        elif sr_code == 12:
            rate = r.read(8) * 1000
        elif sr_code == 13:
            rate = r.read(16)
        elif sr_code == 14:
            rate = r.read(16) * 10
        else:
            raise ValueError("flac: invalid sample rate code")
        bits = si_bits if ss_code == 0 else _BITS.get(ss_code)
        if bits is None:
            raise ValueError("flac: reserved sample size code")
        hdr_end = r.byte_pos() if r.pos % 8 == 0 else None
        if hdr_end is None:
            raise ValueError("flac: unaligned frame header")
        if _crc8(payload[frame_start:hdr_end]) != r.read(8):
            raise ValueError("flac: frame header CRC-8 mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            sub = [
                _decode_subframe(r, block_size, bits) for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            n_ch = 2
            # side channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _decode_subframe(r, block_size, bits)
                side = _decode_subframe(r, block_size, bits + 1)
                sub = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # side/right
                side = _decode_subframe(r, block_size, bits + 1)
                right = _decode_subframe(r, block_size, bits)
                sub = [[s + rr for s, rr in zip(side, right)], right]
            else:  # mid/side
                mid = _decode_subframe(r, block_size, bits)
                side = _decode_subframe(r, block_size, bits + 1)
                sub = [[], []]
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    sub[0].append((m2 + s) >> 1)
                    sub[1].append((m2 - s) >> 1)
        else:
            raise ValueError("flac: reserved channel assignment")
        if n_ch != si_channels:
            raise ValueError("flac: frame channel count != STREAMINFO")
        r.align()
        crc_pos = r.byte_pos()
        if _crc16(payload[frame_start:crc_pos]) != r.read(16):
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = r.byte_pos()
        for c in range(n_ch):
            chans[c].extend(sub[c])
        n_frames += 1

    if si_total and any(len(c) != si_total for c in chans):
        raise ValueError("flac: decoded sample count != STREAMINFO total")
    n = len(chans[0]) if chans else 0
    samples: list[int] = []
    for i in range(n):
        for c in range(si_channels):
            samples.append(chans[c][i])
    return {
        "channels": si_channels,
        "sample_rate": si_rate,
        "bits": si_bits,
        "n_frames": n,
        "samples": samples,
    }


# ---------------------------------------------------------------------------
# encoder (fixture-grade)
# ---------------------------------------------------------------------------


def _write_utf8_number(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    # k continuation bytes carry 6 bits each; the lead byte starts with
    # (k+1) ones then 0 and carries 6-k payload bits
    k = 1
    while v >= (1 << (5 * k + 6)):
        k += 1
    lead_ones = (0xFF << (7 - k)) & 0xFF
    w.write(lead_ones | (v >> (6 * k)), 8)
    for i in range(k - 1, -1, -1):
        w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def _encode_residual(
    w: _BitWriter,
    resid: list[int],
    block_size: int,
    order: int,
    partition_order: int,
    force_escape: bool,
) -> None:
    w.write(0, 2)  # method 0: 4-bit Rice
    w.write(partition_order, 4)
    n_part = 1 << partition_order
    if block_size % n_part:
        raise ValueError("flac encoder: partitions must divide block size")
    idx = 0
    for part in range(n_part):
        count = block_size // n_part - (order if part == 0 else 0)
        if count < 0:
            raise ValueError("flac encoder: order exceeds first partition")
        chunk = resid[idx : idx + count]
        idx += count
        if force_escape:
            raw = max(
                (x.bit_length() + 1 for x in chunk), default=1
            )
            w.write(0xF, 4)
            w.write(raw, 5)
            for x in chunk:
                w.write(x & ((1 << raw) - 1), raw)
        else:
            us = [_zigzag(x) for x in chunk]
            mean = (sum(us) // max(1, len(us))) or 1
            param = min(14, max(0, mean.bit_length() - 1))
            w.write(param, 4)
            for u in us:
                w.write_unary(u >> param)
                w.write(u & ((1 << param) - 1), param)


def _encode_subframe(
    w: _BitWriter,
    samples: list[int],
    bps: int,
    kind: str,
    order: int,
    partition_order: int,
    force_escape: bool,
    wasted: int,
    lpc_coefs: list[int] | None = None,
    lpc_shift: int = 0,
) -> None:
    if wasted:
        if any(s & ((1 << wasted) - 1) for s in samples):
            raise ValueError("flac encoder: wasted bits require shifted samples")
        samples = [s >> wasted for s in samples]
    eff = bps - wasted
    lo, hi = -(1 << (eff - 1)), (1 << (eff - 1)) - 1
    if any(s < lo or s > hi for s in samples):
        raise ValueError("flac encoder: sample out of range for bit depth")
    w.write(0, 1)
    if kind == "constant":
        if any(s != samples[0] for s in samples):
            raise ValueError("flac encoder: constant subframe needs constant samples")
        w.write(0, 6)
    elif kind == "verbatim":
        w.write(1, 6)
    elif kind == "fixed":
        w.write(0x08 | order, 6)
    elif kind == "lpc":
        w.write(0x20 | (order - 1), 6)
    else:
        raise ValueError(f"flac encoder: unknown subframe kind {kind}")
    if wasted:
        w.write(1, 1)
        w.write(1, wasted)  # unary: (wasted-1) zeros then 1
    else:
        w.write(0, 1)

    if kind == "constant":
        w.write(samples[0] & ((1 << eff) - 1), eff)
        return
    if kind == "verbatim":
        for s in samples:
            w.write(s & ((1 << eff) - 1), eff)
        return
    for s in samples[:order]:
        w.write(s & ((1 << eff) - 1), eff)
    if kind == "fixed":
        coefs, shift = _FIXED_COEFS[order], 0
    else:
        if order < 1:
            raise ValueError("flac encoder: LPC subframe needs order >= 1")
        # The caller clamps order to bs-1 on a short final block; the coef
        # list must match the declared order or the stream desyncs (the
        # decoder reads exactly `order` warm-up samples and coefficients).
        coefs, shift = list(lpc_coefs or [])[:order], lpc_shift
        if len(coefs) != order:
            raise ValueError(
                f"flac encoder: LPC needs {order} coefficients, got {len(coefs)}"
            )
        prec = max((c.bit_length() + 1 for c in coefs), default=2)
        if prec > 15:
            raise ValueError("flac encoder: LPC precision > 15")
        w.write(prec - 1, 4)
        w.write(shift & 0x1F, 5)
        for c in coefs:
            w.write(c & ((1 << prec) - 1), prec)
    resid = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        if kind == "lpc":
            pred >>= shift
        resid.append(samples[i] - pred)
    _encode_residual(
        w, resid, len(samples), order, partition_order, force_escape
    )


def flac_encode(
    channel_samples: list[list[int]],
    bits: int = 16,
    sample_rate: int = 44100,
    block_size: int = 4096,
    subframe: str = "fixed",
    order: int = 2,
    stereo: str = "independent",
    partition_order: int = 0,
    force_escape: bool = False,
    wasted: int = 0,
    lpc_coefs: list[int] | None = None,
    lpc_shift: int = 0,
) -> bytes:
    """Fixture-grade FLAC encoder: lossless by construction (residual
    coding is exact), with every decoder branch reachable by knob —
    ``subframe`` in {constant, verbatim, fixed, lpc}, ``stereo`` in
    {independent, left_side, right_side, mid_side}, Rice
    ``partition_order``, ``force_escape`` raw partitions, ``wasted``
    bits (samples must be multiples of 2**wasted), explicit LPC
    coefficients + shift. Frames are fixed-blocksize; the header uses
    the tabled sample-rate/size codes when they exist and the
    explicit-field escape codes otherwise."""
    n_ch = len(channel_samples)
    if n_ch < 1 or n_ch > 8:
        raise ValueError("flac encoder: 1-8 channels")
    total = len(channel_samples[0])
    if any(len(c) != total for c in channel_samples):
        raise ValueError("flac encoder: ragged channels")
    if stereo != "independent" and n_ch != 2:
        raise ValueError("flac encoder: stereo modes need 2 channels")
    if bits not in (8, 12, 16, 20, 24):
        raise ValueError("flac encoder: unsupported bit depth")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    for _ in range(16):
        si.write(0, 8)  # MD5 unset
    body = si.bytes()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    sr_code = _SAMPLE_RATE_CODES.get(sample_rate)
    if sr_code is None:
        sr_code = 13  # 16-bit Hz follows
        if sample_rate >= 1 << 16:
            raise ValueError("flac encoder: sample rate needs the kHz code")
    frame_no = 0
    for start in range(0, total, block_size):
        bs = min(block_size, total - start)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # 16-bit block-size-1 follows (always explicit)
        w.write(sr_code, 4)
        ch_code = {
            "independent": n_ch - 1,
            "left_side": 8,
            "right_side": 9,
            "mid_side": 10,
        }[stereo]
        w.write(ch_code, 4)
        w.write(_BITS_CODES[bits], 3)
        w.write(0, 1)
        _write_utf8_number(w, frame_no)
        w.write(bs - 1, 16)
        if sr_code == 13:
            w.write(sample_rate, 16)
        w.align()
        w.write(_crc8(w.bytes()), 8)

        chunk = [c[start : start + bs] for c in channel_samples]
        if stereo == "independent":
            subs = [(c, bits) for c in chunk]
        elif stereo == "left_side":
            side = [l - r for l, r in zip(chunk[0], chunk[1])]
            subs = [(chunk[0], bits), (side, bits + 1)]
        elif stereo == "right_side":
            side = [l - r for l, r in zip(chunk[0], chunk[1])]
            subs = [(side, bits + 1), (chunk[1], bits)]
        else:
            mid = [(l + r) >> 1 for l, r in zip(chunk[0], chunk[1])]
            side = [l - r for l, r in zip(chunk[0], chunk[1])]
            subs = [(mid, bits), (side, bits + 1)]
        for s, bps in subs:
            kind = subframe
            if kind == "constant" and any(x != s[0] for x in s):
                kind = "verbatim"  # decorrelated side may not be constant
            if kind == "lpc" and bs - 1 < 1:
                kind = "verbatim"  # 1-sample tail block can't carry LPC
            _encode_subframe(
                w, s, bps, kind,
                min(order, bs - 1) if kind in ("fixed", "lpc") else order,
                partition_order if kind in ("fixed", "lpc") else 0,
                force_escape, wasted if kind != "constant" else 0,
                lpc_coefs, lpc_shift,
            )
        w.align()
        frame = w.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)
