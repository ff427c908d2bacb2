"""MFCC-grade audio features with a cross-engine-exact arithmetic core.

The standard audio-curation gate (speech/music triage, silence and
noise filtering, dedup keys for re-encoded audio) is the mel-cepstral
chain: frame -> spectrum -> mel filterbank -> log -> DCT. Floating-point
FFTs are NOT cross-engine deterministic (summation order, FMA
contraction — measured: even an 8-term chained ``+`` of doubles differs
between Python and DuckDB in the last ulp ~5% of the time), so this
module re-expresses the chain the way ``operators/phash.py`` does the
image DCT — EXACT integer arithmetic wherever a sum occurs, with the
one transcendental (``ln``) applied to exact integers and immediately
re-quantized:

1. DFT power: ``P[k] = (sum x*COS[k])^2 + (sum x*SIN[k])^2`` with
   ``round(cos/sin * 256)`` integer tables — exact int64 (|P| < 4e12);
2. mel energies: ``E[m] = sum_k W[m][k] * P[k]`` with integer
   triangular-filter weights ``round(tri * 256)`` spaced on the
   HTK mel scale ``2595*log10(1+f/700)`` over 0..SR/2 — exact int64
   (< 3.4e16). One-sided spectrum, no interior-bin doubling
   (a fixed convention, stated here so the numbers are reproducible);
3. quantized log-mel: ``q[m] = floor(ln(E[m]+1)*1e6 + 0.5)`` — glibc
   ``log`` on an exact integer is bitwise-identical between CPython and
   DuckDB (verified over 20k values), and the immediate half-up
   quantization makes everything downstream integer again;
4. cepstrum: ``mfcc[c] = (sum_m q[m]*D[c][m]) / (1024*1e6)`` with a
   ``round(cos * 1024)`` DCT-II table — the sum is exact int64, the
   single final division of exact integers is correctly rounded IEEE on
   both engines.

All four constant tables are computed here at import (stdlib ``math``)
and EMBEDDED as literals into the DuckDB oracle, so both engines share
identical integers by construction.

100 TB posture: the whole chain is per-frame map-side arithmetic inside
the same Arrow ``mapInPandas`` pass that decodes the codec — no
shuffle, no state; corpus size enters only the frame count.
"""

from __future__ import annotations

import math

FRAME = 64  # samples per analysis frame
NBINS = FRAME // 2 + 1  # one-sided spectrum bins (33)
NMEL = 8  # mel filters
NCOEF = 4  # cepstral coefficients kept
SAMPLE_RATE = 8000  # fixes the mel spacing (0..4000 Hz)
_TRIG_SCALE = 256
_DCT_SCALE = 1024
_LOG_SCALE = 1_000_000

DFT_COS: list[list[int]] = [
    [
        int(round(math.cos(2 * math.pi * k * t / FRAME) * _TRIG_SCALE))
        for t in range(FRAME)
    ]
    for k in range(NBINS)
]
DFT_SIN: list[list[int]] = [
    [
        int(round(math.sin(2 * math.pi * k * t / FRAME) * _TRIG_SCALE))
        for t in range(FRAME)
    ]
    for k in range(NBINS)
]


def _mel(f: float) -> float:
    return 2595.0 * math.log10(1.0 + f / 700.0)


def _mel_inv(m: float) -> float:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def _mel_weights() -> list[list[int]]:
    """NMEL x NBINS integer triangular filters on the HTK mel scale."""
    lo, hi = _mel(0.0), _mel(SAMPLE_RATE / 2.0)
    pts = [lo + (hi - lo) * i / (NMEL + 1) for i in range(NMEL + 2)]
    bin_pos = [_mel_inv(m) / (SAMPLE_RATE / FRAME) for m in pts]
    table = []
    for m in range(NMEL):
        a, b, c = bin_pos[m], bin_pos[m + 1], bin_pos[m + 2]
        row = []
        for k in range(NBINS):
            if a < k < b:
                w = (k - a) / (b - a)
            elif b <= k < c:
                w = (c - k) / (c - b)
            else:
                w = 0.0
            row.append(int(round(w * _TRIG_SCALE)))
        table.append(row)
    return table


MEL_W: list[list[int]] = _mel_weights()

DCT_MEL: list[list[int]] = [
    [
        int(round(math.cos(math.pi * c * (2 * m + 1) / (2 * NMEL)) * _DCT_SCALE))
        for m in range(NMEL)
    ]
    for c in range(NCOEF)
]


def mel_energies(frame: list[int]) -> list[int]:
    """EXACT integer mel-filterbank energies for one FRAME-sample frame."""
    if len(frame) != FRAME:
        raise ValueError(f"mel_energies needs exactly {FRAME} samples")
    power = []
    for k in range(NBINS):
        xr = sum(c * x for c, x in zip(DFT_COS[k], frame))
        xi = sum(s * x for s, x in zip(DFT_SIN[k], frame))
        power.append(xr * xr + xi * xi)
    return [
        sum(w * p for w, p in zip(MEL_W[m], power)) for m in range(NMEL)
    ]


def quantized_log_mel(energies: list[int]) -> list[int]:
    """``floor(ln(E+1)*1e6 + 0.5)`` — half-up, matching DuckDB's ROUND
    for the non-negative values ln produces here."""
    return [int(math.floor(math.log(e + 1) * _LOG_SCALE + 0.5)) for e in energies]


def mfcc_scaled(qlog: list[int]) -> list[int]:
    """EXACT integer cepstral coefficients, scaled by 1024*1e6; divide
    by ``MFCC_DIVISOR`` (a power-of-two times 1e6 — exactly
    representable, so the one float division is identical IEEE on every
    engine) for the real-valued MFCC."""
    return [
        sum(d * q for d, q in zip(DCT_MEL[c], qlog)) for c in range(NCOEF)
    ]


MFCC_DIVISOR = float(_DCT_SCALE * _LOG_SCALE)  # 1.024e9, exact in binary


def mfcc_frame(frame: list[int]) -> tuple[list[int], list[float]]:
    """(mel_energies, mfcc[NCOEF]) for one frame — the full chain."""
    e = mel_energies(frame)
    scaled = mfcc_scaled(quantized_log_mel(e))
    return e, [s / MFCC_DIVISOR for s in scaled]
