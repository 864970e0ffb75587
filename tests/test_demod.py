"""Demodulator functional tests: synthesize a modulated carrier, demodulate,
check recovered audio (frequency, distortion, stereo separation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdrpp_tpu.models.analog import AMDemod, CWDemod, NFMDemod, SSBDemod, WFMDemod
from sdrpp_tpu.models.channel import RxVFO


def tone_snr(audio, fs, f0, skip=0.25):
    """SNR of a single recovered tone (signal bin vs everything else)."""
    seg = np.asarray(audio, np.float64)[int(len(audio) * skip):]
    seg = seg - seg.mean()
    win = np.hanning(len(seg))
    S = np.abs(np.fft.rfft(seg * win)) ** 2
    freqs = np.fft.rfftfreq(len(seg), 1 / fs)
    k = np.argmin(np.abs(freqs - f0))
    sig = S[max(k - 3, 0): k + 4].sum()
    noise = S[1:].sum() - sig
    return 10 * np.log10(sig / max(noise, 1e-30))


def test_am_demod_recovers_tone():
    fs, f_aud, n = 24000.0, 1000.0, 48000
    t = np.arange(n) / fs
    msg = 0.5 * np.sin(2 * np.pi * f_aud * t)
    iq = ((1.0 + msg) * np.exp(1j * 0.3)).astype(np.complex64)
    d = AMDemod(bandwidth=12000.0, samplerate=fs, agc_mode="audio")
    st, y = d(d.init_state(), jnp.asarray(iq))
    assert tone_snr(y, fs, f_aud) > 30


def test_ssb_usb_demod():
    # USB signal: a tone at +1 kHz inside the 2.7 kHz passband. After
    # translating by +bw/2, audio = tone at 1 kHz + bw/2 offset applied.
    fs, n = 48000.0, 96000
    bw = 2700.0
    t = np.arange(n) / fs
    f_tone = 1000.0
    # SSB demod translates by +bw/2 then takes re. A baseband tone at
    # (f_tone - bw/2) maps to audio f_tone.
    iq = np.exp(2j * np.pi * (f_tone - bw / 2) * t).astype(np.complex64)
    d = SSBDemod("usb", bandwidth=bw, samplerate=fs)
    st, y = d(d.init_state(), jnp.asarray(iq))
    assert tone_snr(y, fs, f_tone) > 30


def test_cw_demod_tone_offset():
    fs, n = 3000.0, 30000
    t = np.arange(n) / fs
    iq = (np.ones(n) * 0.5).astype(np.complex64)  # carrier at 0 Hz
    d = CWDemod(tone=800.0, samplerate=fs)
    st, y = d(d.init_state(), jnp.asarray(iq))
    # Carrier translated to the 800 Hz BFO tone.
    assert tone_snr(y, fs, 800.0) > 30


def test_nfm_demod():
    fs, dev, f_aud, n = 48000.0, 6250.0, 1000.0, 96000
    t = np.arange(n) / fs
    audio = np.sin(2 * np.pi * f_aud * t)
    phase = np.cumsum(2 * np.pi * dev * audio / fs)
    iq = np.exp(1j * phase).astype(np.complex64)
    d = NFMDemod(bandwidth=12500.0, samplerate=fs)
    st, y = d(d.init_state(), jnp.asarray(iq))
    assert tone_snr(y, fs, f_aud) > 30


def make_wfm_mpx(fs, n, l_tone, r_tone):
    """Stereo multiplex: (L+R) + 19k pilot + (L-R) DSB at 38 kHz."""
    t = np.arange(n) / fs
    l = 0.5 * np.sin(2 * np.pi * l_tone * t)
    r = 0.5 * np.sin(2 * np.pi * r_tone * t)
    # FCC 73.322 convention: pilot sin(wt), subcarrier sin(2wt) (zero
    # crossings aligned with positive slope).
    pilot = 0.1 * np.sin(2 * np.pi * 19000.0 * t)
    sub = (l - r) * np.sin(2 * np.pi * 38000.0 * t)
    return 0.45 * (l + r) + pilot + 0.45 * sub, l, r


def test_wfm_stereo_decode():
    fs = 240000.0
    n = 480000
    dev = 75000.0
    mpx, l, r = make_wfm_mpx(fs, n, l_tone=1000.0, r_tone=3000.0)
    phase = np.cumsum(2 * np.pi * dev * mpx / fs)
    iq = np.exp(1j * phase).astype(np.complex64)
    d = WFMDemod(deviation=dev, samplerate=fs, stereo=True)
    st, y = d(d.init_state(), jnp.asarray(iq))
    y = np.asarray(y)
    assert y.shape == (n, 2)
    # Left channel should contain 1 kHz strongly; right 3 kHz.
    snr_l_want = tone_snr(y[:, 0], fs, 1000.0)
    snr_l_leak = tone_snr(y[:, 0], fs, 3000.0)
    snr_r_want = tone_snr(y[:, 1], fs, 3000.0)
    assert snr_l_want > 15, snr_l_want
    assert snr_r_want > 15, snr_r_want
    # Stereo separation: wanted tone much stronger than the other channel's.
    assert snr_l_want - snr_l_leak > 10


def test_wfm_mono_passthrough():
    fs, n, dev = 240000.0, 240000, 75000.0
    t = np.arange(n) / fs
    mpx = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    iq = np.exp(1j * np.cumsum(2 * np.pi * dev * mpx / fs)).astype(np.complex64)
    d = WFMDemod(deviation=dev, samplerate=fs, stereo=False)
    st, y = d(d.init_state(), jnp.asarray(iq))
    y = np.asarray(y)
    assert y.shape == (n, 2)
    np.testing.assert_array_equal(y[:, 0], y[:, 1])
    assert tone_snr(y[:, 0], fs, 1000.0) > 30


def test_rx_vfo_extracts_channel():
    fs_in, fs_out, bw = 1024000.0, 48000.0, 12500.0
    offset = 250000.0
    vfo = RxVFO(fs_in, fs_out, bw, offset)
    n = vfo.block_multiple * max(1, 65536 // vfo.block_multiple)
    t = np.arange(n) / fs_in
    # Wanted channel at +250 kHz, interferer at -100 kHz
    iq = (np.exp(2j * np.pi * (offset + 1000.0) * t)
          + np.exp(2j * np.pi * (-100000.0) * t)).astype(np.complex64)
    st, y = vfo(vfo.init_state(), jnp.asarray(iq))
    y = np.asarray(y)
    assert y.shape[-1] == vfo.out_count(n)
    spec = np.abs(np.fft.fft(y[len(y) // 2:]))
    freqs = np.fft.fftfreq(len(spec), 1 / fs_out)
    k = np.argmax(spec)
    assert abs(freqs[k] - 1000.0) < 10.0
    # Interferer (aliases far outside passband) well suppressed.
    k_int = np.argmin(np.abs(freqs - (-4000.0)))
    assert spec[k] > 100 * spec[k_int]
