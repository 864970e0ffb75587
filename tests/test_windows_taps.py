"""Oracle tests for window functions and tap designers vs. reference formulas."""

import numpy as np
import pytest

from sdrpp_tpu.ops import taps, windows
from sdrpp_tpu.ops.windows import Window


def ref_cosine(n, N, coefs):
    win = 0.0
    sign = 1.0
    for i, c in enumerate(coefs):
        win += sign * c * np.cos(i * 2.0 * np.pi * n / N)
        sign = -sign
    return win


@pytest.mark.parametrize("kind", list(Window))
def test_window_matches_formula(kind):
    N = 64
    coefs = windows.COEFS[kind]
    got = windows.cosine_window(np.arange(N), float(N), coefs)
    want = np.array([ref_cosine(i, N, coefs) for i in range(N)])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_create_window_unity_gain():
    for kind in Window:
        w = windows.create_window(kind, 128, centered=False)
        assert abs(w.astype(np.float64).sum() - 1.0) < 1e-5


def test_create_window_centered_signs():
    w = windows.create_window(Window.HANN, 16, centered=False)
    wc = windows.create_window(Window.HANN, 16, centered=True)
    # Even indices flipped negative, odd kept positive (window.h:56-61).
    np.testing.assert_allclose(wc[::2], -w[::2], rtol=1e-6)
    np.testing.assert_allclose(wc[1::2], w[1::2], rtol=1e-6)


def test_estimate_tap_count():
    # 3.8*fs/trans, truncated (estimate_tap_count.h:4-6)
    assert taps.estimate_tap_count(1000.0, 48000.0) == int(3.8 * 48.0)
    assert taps.estimate_tap_count(2400.0, 24000.0) == 38


def test_low_pass_dc_gain():
    t = taps.low_pass(3000.0, 600.0, 48000.0)
    # Low-pass windowed sinc should have ~unity DC gain.
    assert abs(t.astype(np.float64).sum() - 1.0) < 0.01
    assert t.shape[0] == taps.estimate_tap_count(600.0, 48000.0)


def test_low_pass_frequency_response():
    fs = 48000.0
    cutoff = 3000.0
    t = taps.low_pass(cutoff, 600.0, fs).astype(np.float64)
    H = np.fft.rfft(t, 4096)
    freqs = np.fft.rfftfreq(4096, 1 / fs)
    # Passband ~1, stopband small.
    pb = np.abs(H[freqs < cutoff * 0.8])
    sb = np.abs(H[freqs > cutoff + 700.0])
    assert np.all(pb > 0.9) and np.all(pb < 1.1)
    assert np.all(sb < 0.02)


def test_high_pass_frequency_response():
    fs = 48000.0
    cutoff = 300.0
    t = taps.high_pass(cutoff, 100.0, fs).astype(np.float64)
    H = np.abs(np.fft.rfft(t, 8192))
    freqs = np.fft.rfftfreq(8192, 1 / fs)
    assert np.all(H[freqs < cutoff * 0.3] < 0.05)
    assert np.all(H[(freqs > cutoff * 3) & (freqs < fs / 2 - 500)] > 0.8)


def test_band_pass_complex_asymmetric():
    fs = 250000.0
    t = taps.band_pass(18750.0, 19250.0, 3000.0, fs, complex_taps=True)
    assert t.dtype == np.complex64
    # Correlation orientation: reference FIR computes sum taps[j]*x[i+j],
    # equivalent to convolution with reversed taps. Response at +19k should
    # pass; -19k should be stopped.
    rev = t[::-1].astype(np.complex128)
    H = np.fft.fft(rev, 8192)
    freqs = np.fft.fftfreq(8192, 1 / fs)
    peak_pos = np.abs(H[np.argmin(np.abs(freqs - 19000))])
    peak_neg = np.abs(H[np.argmin(np.abs(freqs + 19000))])
    # NOTE: the reference's pilot filter has ~0.22 passband gain (tap count
    # from the 3 kHz transition truncates the 500 Hz-wide sinc); what matters
    # is the single-sideband asymmetry and the peak location.
    assert peak_pos > 1e5 * peak_neg
    k = np.argmax(np.abs(H))
    assert abs(freqs[k] - 19000.0) < 100.0
    # Wide-band complex band-pass does reach unity gain.
    t2 = taps.band_pass(10000.0, 30000.0, 2000.0, fs, complex_taps=True)
    H2 = np.fft.fft(t2[::-1].astype(np.complex128), 8192)
    f2 = np.fft.fftfreq(8192, 1 / fs)
    assert abs(np.abs(H2[np.argmin(np.abs(f2 - 20000))]) - 1.0) < 0.05


def test_rrc_symmetry_and_peak():
    t = taps.root_raised_cosine(31, 0.35, 4.0)
    np.testing.assert_allclose(t, t[::-1], rtol=1e-5)
    assert np.argmax(t) in (15,)


def test_rrc_singularities_finite():
    # Ts/(4*beta) lands on a tap for beta=0.25, Ts=4 -> limit=4.0, t=+-4
    t = taps.root_raised_cosine(32, 0.25, 4.0)
    assert np.all(np.isfinite(t))
