"""OFDM sync kernels: CP correlation, symbol framing, PRS sync."""

import numpy as np
import jax
import jax.numpy as jnp

from sdrpp_tpu.ops.ofdm import (CyclicSync, cyclic_prefix_correlation,
                                phase_reference_sync)


def make_ofdm_stream(n_syms, fft_len=256, cp_len=32, seed=0):
    """Random-OFDM symbols with cyclic prefixes."""
    rng = np.random.default_rng(seed)
    syms = []
    for _ in range(n_syms):
        spec = (rng.standard_normal(fft_len) + 1j * rng.standard_normal(fft_len))
        td = np.fft.ifft(spec)
        td = td / np.sqrt(np.mean(np.abs(td) ** 2))
        syms.append(np.concatenate([td[-cp_len:], td]))  # CP + body
    return np.concatenate(syms).astype(np.complex64)


def test_cp_correlation_peaks_at_symbol_ends():
    fft_len, cp = 256, 32
    x = make_ofdm_stream(8, fft_len, cp)
    tail = jnp.zeros(fft_len + cp - 1, jnp.complex64)
    tail, rcorr, vals = cyclic_prefix_correlation(tail, jnp.asarray(x), fft_len, cp)
    rcorr = np.asarray(rcorr)
    # CP correlation should show periodic peaks with period fft_len+cp.
    period = fft_len + cp
    # Find the strongest peak in each period after the first (warmup).
    peaks = [np.argmax(rcorr[k * period:(k + 1) * period]) for k in range(2, 7)]
    # Peaks should be at a consistent position modulo the period (use a
    # circular deviation since positions can wrap 0 <-> period-1).
    ang = np.exp(2j * np.pi * np.asarray(peaks) / period)
    circ_dev = np.sqrt(-2 * np.log(np.abs(np.mean(ang)) + 1e-12)) * period / (2 * np.pi)
    assert circ_dev < 3.0, (peaks, circ_dev)
    # Peak level well above the median correlation.
    assert np.max(rcorr[period:]) > 3 * np.median(rcorr[period:])


def test_cp_correlation_multiblock_continuity():
    fft_len, cp = 128, 16
    x = make_ofdm_stream(12, fft_len, cp)
    tail = jnp.zeros(fft_len + cp - 1, jnp.complex64)
    r_all = []
    half = len(x) // 2
    for blk in (x[:half], x[half:]):
        tail, rcorr, _ = cyclic_prefix_correlation(tail, jnp.asarray(blk),
                                                   fft_len, cp)
        r_all.append(np.asarray(rcorr))
    joined = np.concatenate(r_all)
    # Reference: one-shot computation
    tail2 = jnp.zeros(fft_len + cp - 1, jnp.complex64)
    _, ref, _ = cyclic_prefix_correlation(tail2, jnp.asarray(x), fft_len, cp)
    np.testing.assert_allclose(joined, np.asarray(ref), atol=1e-3)


def test_cyclic_sync_emits_symbols():
    fft_len, cp = 256, 32
    fs = 1.0
    x = make_ofdm_stream(10, fft_len, cp)
    cs = CyclicSync(symbol_length=fft_len, cyclic_prefix_length=cp, samplerate=fs)
    st = cs.init_state()
    st, (syms, valid) = jax.jit(cs)(st, jnp.asarray(x))
    nv = int(np.asarray(valid).sum())
    # ~10 symbols in, expect close to that many framed out.
    assert 6 <= nv <= 12, nv
    assert np.all(np.isfinite(np.asarray(syms).view(np.float32)))


def test_phase_reference_sync_finds_offset_and_cfo():
    rng = np.random.default_rng(1)
    n = 512
    prs = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    # Received: PRS circularly shifted by 37 samples + small noise
    shift = 37
    rx = np.roll(prs, shift) + 0.05 * (rng.standard_normal(n)
                                       + 1j * rng.standard_normal(n))
    k, mag, cfo = phase_reference_sync(jnp.asarray(rx.astype(np.complex64)), prs)
    assert int(k) == shift
    assert int(cfo) == 0
    # With an integer CFO of +3 bins
    rx2 = rx * np.exp(2j * np.pi * 3 * np.arange(n) / n)
    k2, mag2, cfo2 = phase_reference_sync(jnp.asarray(rx2.astype(np.complex64)), prs)
    assert abs(int(cfo2) - 3) <= 1


def test_dab_prs_cfo_and_constellation():
    from sdrpp_tpu.ops.ofdm import (dab_null_detect, dab_prs_cfo,
                                    dab_prs_constellation, load_dab_prs_conj)
    prs_conj = load_dab_prs_conj()
    assert prs_conj.shape == (2048,)
    prs = np.conj(prs_conj)
    # Clean PRS -> zero CFO estimate
    assert abs(float(dab_prs_cfo(jnp.asarray(prs)))) < 5e-3
    # Known 3-bin CFO recovered to sub-bin accuracy
    cfo = 2 * np.pi * 3 / 2048
    rx = (prs * np.exp(1j * cfo * np.arange(2048))).astype(np.complex64)
    assert abs(float(dab_prs_cfo(jnp.asarray(rx))) - cfo) < 5e-4
    # Null-symbol detection + AGC update
    is_null, avg = dab_null_detect(10.0, 100.0)
    assert bool(is_null) and abs(float(avg) - 99.1) < 0.2
    # The PRS itself is DQPSK: adjacent-bin differential demod clusters
    # perfectly on the 4 phases (validates the extracted table + demod math).
    c = np.asarray(dab_prs_constellation(jnp.asarray(prs)))
    fold = np.mod(np.angle(c), np.pi / 2)
    h, _ = np.histogram(fold, bins=9, range=(0, np.pi / 2))
    assert h.max() > 0.9 * h.sum()
