"""Shared-FFT channelizer bank vs the time-domain oracle.

Oracle: per-channel exact NCO mix -> streaming FIR (conv) -> decimate at
phase m-1 — the same function the channelizer computes through one shared
wideband FFT (ops/channelizer.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrpp_tpu.ops.channelizer import FFTChannelizerBank


def oracle(x_all, taps, alphas, n, R, nblocks):
    m = len(taps)
    outs = []
    for alpha in alphas:
        g = np.arange(len(x_all))
        mixed = x_all.astype(np.complex128) * np.exp(1j * alpha * g)
        y = np.convolve(mixed, taps)[: len(x_all)]
        ch = [y[B * n + R * np.arange(n // R)] for B in range(nblocks)]
        outs.append(np.concatenate(ch))
    return np.stack(outs)


@pytest.mark.parametrize("prune", [False, True])
def test_channelizer_matches_time_domain_oracle(prune):
    rng = np.random.default_rng(0)
    fs, out = 512000.0, 32000.0
    R = int(fs / out)
    n, nblocks = 4096, 3
    offsets = np.array([-171000.0, -12345.6789, 0.0, 98765.4321, 200000.0])
    bank = FFTChannelizerBank(offsets, fs, out, prune=prune)
    alphas = bank.alphas
    taps = bank.taps

    x_all = (rng.standard_normal(nblocks * n)
             + 1j * rng.standard_normal(nblocks * n)).astype(np.complex64)
    want = oracle(x_all, taps, alphas, n, R, nblocks)

    state = bank.init_state()
    step = jax.jit(bank)
    got = []
    for B in range(nblocks):
        state, y = step(state, jnp.asarray(x_all[B * n:(B + 1) * n]))
        got.append(np.asarray(y))
    got = np.concatenate(got, axis=-1)

    scale = np.abs(want).max()
    tol = 5e-5 if prune else 2e-5  # pruned adds stopband-leakage truncation
    assert np.abs(got - want).max() / scale < tol


def test_channelizer_with_channel_filter_and_vfobank_interface():
    """bandwidth < out_rate adds the channel LPF like VFOBank; the block
    exposes the same interface (out_count/block_multiple/channels)."""
    rng = np.random.default_rng(1)
    fs, out = 256000.0, 32000.0
    offsets = np.array([-60000.0, 40000.0])
    bank = FFTChannelizerBank(offsets, fs, out, bandwidth=12500.0)
    assert bank.channels == 2 and bank.out_count(4096) == 512
    assert 4096 % bank.block_multiple == 0

    # a tone inside channel 1's passband and another outside it
    n = 8192
    t = np.arange(2 * n) / fs
    x = (0.5 * np.exp(2j * np.pi * (40000.0 + 2000.0) * t)
         + 0.5 * np.exp(2j * np.pi * (40000.0 + 11000.0) * t)) \
        .astype(np.complex64)
    state = bank.init_state()
    step = jax.jit(bank)
    state, y1 = step(state, jnp.asarray(x[:n]))
    state, y2 = step(state, jnp.asarray(x[n:]))
    y = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)[1, 256:]
    spec = np.abs(np.fft.fft(y * np.hanning(len(y))))
    freqs = np.fft.fftfreq(len(y), 1.0 / out)
    in_band = spec[np.abs(freqs - 2000.0) < 500].max()
    out_band = spec[np.abs(freqs - 11000.0) < 500].max()
    # 11 kHz is outside the 12.5 kHz channel (6.25 kHz cutoff) -> filtered
    assert in_band > 30 * out_band


def test_channelizer_rejects_bad_config():
    with pytest.raises(ValueError, match="integer decimation"):
        FFTChannelizerBank([0.0], 100000.0, 48000.0)
    bank = FFTChannelizerBank([0.0], 128000.0, 32000.0)
    with pytest.raises(ValueError, match="multiple"):
        bank(bank.init_state(), jnp.zeros(1001, jnp.complex64))


def test_scanner_bank_fft_channelizer_close_to_time_domain():
    """ScannerBank(channelizer='fft') demodulates the same stations; NFM
    audio from both channelizers matches closely (filters differ slightly
    by design: single-stage lowPass vs decim-plan cascade, so compare the
    recovered audio tone, not raw samples)."""
    from sdrpp_tpu.parallel.vfo_bank import ScannerBank

    fs = 512000.0
    offs = np.array([-128000.0, 64000.0])
    n = 32768
    t = np.arange(2 * n) / fs
    iq = (0.4 * np.exp(1j * (2 * np.pi * 64000.0 * t
                             + np.cumsum(2 * np.pi * 5000.0
                                         * np.sin(2 * np.pi * 700.0 * t) / fs)))
          ).astype(np.complex64)

    audios = {}
    for chan in ("time", "fft"):
        bank = ScannerBank(offs, fs, mode="nfm", if_rate=32000.0,
                           bandwidth=12500.0, channelizer=chan)
        assert n % bank.block_multiple == 0
        st = bank.init_state()
        step = jax.jit(bank)
        st, a1 = step(st, jnp.asarray(iq[:n]))
        st, a2 = step(st, jnp.asarray(iq[n:]))
        audios[chan] = np.concatenate([np.asarray(a1), np.asarray(a2)],
                                      axis=-1)

    for chan, audio in audios.items():
        y = audio[1, 512:]
        spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
        f = np.fft.rfftfreq(len(y), 1 / 32000.0)
        pk = f[np.argmax(spec[1:]) + 1]
        assert abs(pk - 700.0) < 10.0, f"{chan}: tone at {pk}"
        # (channel 0 carries no signal; FM demod of an empty channel is
        # noise on BOTH paths, so only the modulated channel is compared)


def test_fft_channelizer_sharded_equals_unsharded():
    """The channelizer's static-slice gather partitions cleanly under
    channel sharding (GSPMD) — sharded == unsharded on the virtual mesh."""
    from sdrpp_tpu.parallel.mesh import make_mesh
    from sdrpp_tpu.parallel.vfo_bank import ScannerBank

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = make_mesh(8, 1)
    C, fs = 16, 512000.0
    offs = np.linspace(-200000.0, 200000.0, C)
    bank = ScannerBank(offs, fs, mode="nfm", if_rate=32000.0,
                       bandwidth=12500.0, channelizer="fft")
    n = bank.block_multiple * max(1, 8192 // bank.block_multiple)
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(n)
         + 1j * rng.standard_normal(n)).astype(np.complex64)

    state, in_sh, out_sh = bank.shard(mesh, bank.init_state())
    step = jax.jit(bank, in_shardings=(None, in_sh), out_shardings=(None, out_sh))
    _, audio_sharded = step(state, jax.device_put(jnp.asarray(x), in_sh))
    _, audio_ref = bank(bank.init_state(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(audio_sharded),
                               np.asarray(audio_ref), atol=1e-5, rtol=1e-5)
    assert len(audio_sharded.sharding.device_set) == 8
