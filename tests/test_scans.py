"""Scan-block parity vs. per-sample NumPy oracles replicating the reference
loops exactly (DC blocker, de-emphasis, AGC, FastAGC, PLL, Costas,
noise blanker, squelch, quadrature FM)."""

import numpy as np
import jax.numpy as jnp

from sdrpp_tpu.ops import fm, scans
from sdrpp_tpu.ops.mix import FrequencyXlator, hz_to_rads, mix


def test_dc_blocker_matches_loop():
    rng = np.random.default_rng(0)
    rate = 0.001
    x = (rng.standard_normal(256) + 0.5).astype(np.float32)
    # Reference loop (dc_blocker.h:54-61)
    offset = 0.0
    want = np.zeros_like(x)
    for i in range(len(x)):
        want[i] = x[i] - offset
        offset += want[i] * rate

    blk = scans.DCBlocker(rate, dtype=jnp.float32)
    st, got = blk(blk.init_state(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    assert abs(float(st) - offset) < 1e-4


def test_dc_blocker_complex_carry():
    rng = np.random.default_rng(1)
    rate = 0.01
    x = (rng.standard_normal(128) + 1j * rng.standard_normal(128) + (0.3 - 0.2j)).astype(
        np.complex64)
    blk = scans.DCBlocker(rate, dtype=jnp.complex64)
    st = blk.init_state()
    offset = 0.0 + 0.0j
    for b in (x[:64], x[64:]):
        want = np.zeros_like(b)
        for i in range(len(b)):
            want[i] = b[i] - offset
            offset += want[i] * rate
        st, got = blk(st, jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_deemphasis_matches_loop():
    rng = np.random.default_rng(2)
    tau, fs = 50e-6, 48000.0
    dt = 1.0 / fs
    alpha = np.float32(dt / (tau + dt))
    x = rng.standard_normal(300).astype(np.float32)
    last = 0.0
    want = np.zeros_like(x)
    for i in range(len(x)):
        last = alpha * x[i] + (1 - alpha) * last
        want[i] = last

    blk = scans.Deemphasis(tau, fs)
    st, got = blk(blk.init_state(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_deemphasis_stereo_shape():
    blk = scans.Deemphasis(50e-6, 48000.0, stereo=True)
    x = jnp.ones((64, 2), jnp.float32)
    st, y = blk(blk.init_state(), x)
    assert y.shape == (64, 2)
    assert st.shape == (2,)


def ref_agc(x, set_point, attack, decay, max_gain, max_out, amp, gain):
    """Reference AGC::process enabled branch (agc.h:88-127)."""
    out = np.zeros_like(x)
    for i in range(len(x)):
        a = abs(x[i])
        if a != 0.0:
            amp = amp * (1 - attack) + a * attack if a > amp else amp * (1 - decay) + a * decay
            gain = min(set_point / amp, max_gain)
        else:
            gain = 1.0
        if a * gain > max_out:
            amp = np.max(np.abs(x[i:]))
            gain = min(set_point / amp, max_gain)
        out[i] = x[i] * gain
    return out, amp, gain


def test_agc_matches_loop():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(200) * np.linspace(0.1, 2.0, 200)).astype(np.float32)
    sp, att, dec, mg, mo = 1.0, 0.1, 0.01, 1e4, 10.0
    want, amp_f, gain_f = ref_agc(x.astype(np.float64), sp, att, dec, mg, mo,
                                  amp=sp / 1.0, gain=1.0)
    blk = scans.AGC(sp, att, dec, mg, mo)
    st, got = blk(blk.init_state(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=1e-4)


def test_agc_lookahead_clip():
    # Big spike triggers the look-ahead path (agc.h:110-123).
    x = np.ones(50, np.float32) * 0.5
    x[10] = 100.0
    x[30] = 50.0
    sp, att, dec, mg, mo = 1.0, 0.5, 0.01, 1e6, 1.0
    want, _, _ = ref_agc(x.astype(np.float64), sp, att, dec, mg, mo, amp=1.0, gain=1.0)
    blk = scans.AGC(sp, att, dec, mg, mo)
    st, got = blk(blk.init_state(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_fast_agc_matches_loop():
    rng = np.random.default_rng(4)
    x = (rng.standard_normal(128) + 1j * rng.standard_normal(128)).astype(np.complex64)
    sp, mg, rate = 1.0, 1e4, 0.01
    gain = 1.0
    want = np.zeros_like(x)
    for i in range(len(x)):
        want[i] = x[i] * gain
        gain += (sp - abs(want[i])) * rate
        gain = min(gain, mg)
    blk = scans.FastAGC(sp, mg, rate)
    st, got = blk(blk.init_state(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-5)


def test_pll_locks_to_tone():
    fs = 48000.0
    f0 = 1000.0
    n = 4096
    ph = 2 * np.pi * f0 * np.arange(n) / fs + 0.7
    x = np.exp(1j * ph).astype(np.complex64)
    blk = scans.PLL(bandwidth=0.02)
    st, vco = blk(blk.init_state(), jnp.asarray(x))
    vco = np.asarray(vco)
    # After settling, VCO should track input phase.
    err = np.angle(x[-500:] * np.conj(vco[-500:]))
    assert np.max(np.abs(err)) < 0.05


def test_costas4_locks_qpsk_carrier():
    rng = np.random.default_rng(5)
    n = 8192
    # QPSK symbols at small carrier offset
    syms = (rng.integers(0, 4, n))
    const = np.exp(1j * (np.pi / 4 + np.pi / 2 * syms))
    off = 0.01  # rad/sample
    x = (const * np.exp(1j * off * np.arange(n))).astype(np.complex64)
    blk = scans.Costas(4, bandwidth=0.01)
    st, y = blk(blk.init_state(), jnp.asarray(x))
    # Final loop frequency should approach the offset.
    assert abs(float(st["freq"]) - off) < 2e-3


def test_noise_blanker_matches_loop():
    rng = np.random.default_rng(6)
    x = (rng.standard_normal(128) + 1j * rng.standard_normal(128)).astype(np.complex64)
    x[50] *= 30.0
    rate, level = 0.01, 3.0
    amp = 1.0
    want = np.zeros_like(x)
    for i in range(len(x)):
        a = abs(x[i])
        gain = 1.0
        if a != 0.0:
            amp = amp * (1 - rate) + a * rate
            excess = a / amp
            if excess > level:
                gain = 1.0 / excess
        want[i] = x[i] * gain
    blk = scans.NoiseBlanker(rate, level)
    st, got = blk(blk.init_state(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-5)


def test_squelch_mutes_noise_passes_signal():
    blk = scans.Squelch(level_db=-20.0, sub_blocks=4)
    quiet = (np.ones(1024) * 1e-4).astype(np.complex64)
    loud = (np.ones(1024) * 1.0).astype(np.complex64)
    st = blk.init_state()
    st, y_quiet = blk(st, jnp.asarray(quiet))
    assert np.all(np.asarray(y_quiet) == 0)
    # Unmute needs 10 consecutive above-threshold frames (squelch.h:40-47).
    for _ in range(5):
        st, y_loud = blk(st, jnp.asarray(loud))
    assert np.any(np.asarray(y_loud) != 0)


def test_squelch_then_fm_demod_is_silent():
    # Regression: gating by multiplication produced -0.0 samples and
    # atan2(+0, -0) = pi made the FM discriminator output full-scale noise
    # on muted blocks. Muted -> demodulated audio must be exactly 0.
    rng = np.random.default_rng(7)
    x = (0.001 * (rng.standard_normal(2048) + 1j * rng.standard_normal(2048))
         ).astype(np.complex64)
    sq = scans.Squelch(-30.0)
    st, y = sq(sq.init_state(), jnp.asarray(x))
    assert np.all(np.asarray(y) == 0)
    blk = fm.Quadrature(5000.0, 48000.0)
    st2, audio = blk(blk.init_state(), y)
    assert np.all(np.asarray(audio) == 0)


def test_quadrature_fm_demod():
    fs = 48000.0
    dev = 5000.0
    f_audio = 1000.0
    n = 4800
    t = np.arange(n) / fs
    audio = np.sin(2 * np.pi * f_audio * t)
    phase = np.cumsum(2 * np.pi * dev * audio / fs)
    x = np.exp(1j * phase).astype(np.complex64)
    blk = fm.Quadrature(dev, fs)
    st, y = blk(blk.init_state(), jnp.asarray(x))
    y = np.asarray(y)
    # Skip first sample (carry=0), compare rest to audio.
    np.testing.assert_allclose(y[10:], audio[10:], atol=0.01)


def test_mix_phase_continuity():
    fs = 48000.0
    f = 1234.5
    omega = hz_to_rads(f, fs)
    n = 1000
    x = np.ones(2 * n, np.complex64)
    xl = FrequencyXlator(f, fs)
    st = xl.init_state()
    st, y1 = xl(st, jnp.asarray(x[:n]))
    st, y2 = xl(st, jnp.asarray(x[n:]))
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    want = np.exp(1j * omega * np.arange(2 * n))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_carrier_tracking_pll_removes_carrier():
    fs, f0, n = 48000.0, 1500.0, 8192
    rng = np.random.default_rng(8)
    data = rng.standard_normal(n) * 0.2 + 1.0  # AM-ish envelope
    x = (data * np.exp(1j * (2 * np.pi * f0 * np.arange(n) / fs + 0.4))) \
        .astype(np.complex64)
    blk = scans.CarrierTrackingPLL(bandwidth=0.02)
    st, y = blk(blk.init_state(), jnp.asarray(x))
    y = np.asarray(y)[n // 2:]
    # After lock the carrier is removed: output mostly real/positive.
    assert np.mean(y.real > 0) > 0.95
    assert np.mean(np.abs(y.imag)) < 0.2 * np.mean(np.abs(y.real))
