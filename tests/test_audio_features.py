"""Integer-exact mel-cepstral chain (operators/audio_features.py):
table sanity, agreement with an independent float FFT reference within
the quantization bound, spectral selectivity, and the quantized-log
half-up contract."""

import math

import pytest

from pmp_analytics_spark.operators.audio_features import (
    DCT_MEL,
    DFT_COS,
    DFT_SIN,
    FRAME,
    MEL_W,
    MFCC_DIVISOR,
    NBINS,
    NCOEF,
    NMEL,
    mel_energies,
    mfcc_frame,
    mfcc_scaled,
    quantized_log_mel,
)


def test_table_shapes_and_bounds():
    assert len(DFT_COS) == len(DFT_SIN) == NBINS
    assert all(len(r) == FRAME for r in DFT_COS + DFT_SIN)
    assert all(abs(v) <= 256 for r in DFT_COS + DFT_SIN for v in r)
    assert len(MEL_W) == NMEL and all(len(r) == NBINS for r in MEL_W)
    assert all(0 <= v <= 256 for r in MEL_W for v in r)
    # every filter has support, and supports ascend in frequency
    peaks = [max(range(NBINS), key=lambda k: r[k]) for r in MEL_W]
    assert all(max(r) > 0 for r in MEL_W)
    assert peaks == sorted(peaks)
    assert len(DCT_MEL) == NCOEF and all(len(r) == NMEL for r in DCT_MEL)
    assert DCT_MEL[0] == [1024] * NMEL  # c=0 row is the scaled constant


def test_mel_energies_match_float_fft_reference():
    """The integer chain tracks an INDEPENDENT numpy rfft within the
    table-rounding bound: tables are round(cos*256), so each DFT sum
    errs by < 64*0.5*|x|, i.e. the scaled power errs by a small relative
    margin on non-degenerate frames."""
    import numpy as np

    rng = np.random.default_rng(5)
    x = rng.integers(-80, 80, FRAME).tolist()
    got = mel_energies(x)
    spec = np.abs(np.fft.rfft(np.asarray(x, dtype=float))) ** 2
    ref = [
        sum((w / 256.0) * p for w, p in zip(MEL_W[m], spec)) * 256.0**2 * 256.0
        for m in range(NMEL)
    ]
    for g, r in zip(got, ref):
        assert g == pytest.approx(r, rel=0.05), (g, r)


def test_mel_energy_spectral_selectivity():
    """A pure integer cosine at bin k concentrates mel energy in the
    filters covering k — the property a curation gate relies on."""
    k = 12
    frame = DFT_COS[k]  # the basis row itself (integer samples)
    e = mel_energies(frame)
    covering = [m for m in range(NMEL) if MEL_W[m][k] > 0]
    assert covering
    best = max(range(NMEL), key=lambda m: e[m])
    assert best in covering
    others = [v for m, v in enumerate(e) if m not in covering]
    assert e[best] > 10 * max(others) if others else True


def test_quantized_log_half_up_and_monotone():
    e = [0, 1, 10, 10**6, 3 * 10**16]
    q = quantized_log_mel(e)
    assert q[0] == 0
    assert q == sorted(q)
    assert q[1] == int(math.floor(math.log(2) * 1e6 + 0.5))


def test_mfcc_deterministic_and_bounded():
    frame = [((i * 7) % 53) - 26 for i in range(FRAME)]
    e1, m1 = mfcc_frame(frame)
    e2, m2 = mfcc_frame(frame)
    assert e1 == e2 and m1 == m2
    assert len(m1) == NCOEF
    # |mfcc| <= NMEL * max_q * 1024 / divisor = NMEL * ln(maxE) ~ 8*39
    assert all(abs(v) < NMEL * 40 for v in m1)
    scaled = mfcc_scaled(quantized_log_mel(e1))
    assert [s / MFCC_DIVISOR for s in scaled] == m1


def test_frame_length_enforced():
    with pytest.raises(ValueError, match="exactly"):
        mel_energies([0] * (FRAME - 1))
