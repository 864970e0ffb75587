"""VFO bank + sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrpp_tpu.ops.mix import FrequencyXlatorBank, hz_to_rads
from sdrpp_tpu.parallel.mesh import make_mesh
from sdrpp_tpu.parallel.vfo_bank import ScannerBank, VFOBank


def test_mix_bank_matches_single():
    fs = 96000.0
    offs = np.array([1000.0, -2500.0, 12345.0])
    bank = FrequencyXlatorBank(offs, fs)
    n = 4096
    x = (np.random.default_rng(0).standard_normal(n)
         + 1j * np.random.default_rng(1).standard_normal(n)).astype(np.complex64)
    st = bank.init_state()
    st, y = bank(st, jnp.asarray(x))
    y = np.asarray(y)
    assert y.shape == (3, n)
    for c, f in enumerate(offs):
        want = x * np.exp(1j * hz_to_rads(f, fs) * np.arange(n))
        np.testing.assert_allclose(y[c], want, atol=2e-3)
    # Phase carry: second block continues the ramp.
    st, y2 = bank(st, jnp.asarray(x))
    for c, f in enumerate(offs):
        want = x * np.exp(1j * hz_to_rads(f, fs) * (np.arange(n) + n))
        np.testing.assert_allclose(np.asarray(y2)[c], want, atol=4e-3)


def test_vfo_bank_extracts_channels():
    fs_in, fs_out = 512000.0, 32000.0
    offs = np.array([64000.0, -128000.0, 200000.0, 0.0])
    bank = VFOBank(offs, fs_in, fs_out, bandwidth=16000.0)
    n = bank.block_multiple * max(1, 65536 // bank.block_multiple)
    t = np.arange(n) / fs_in
    # One tone near each channel center (+1 kHz offset).
    x = sum(np.exp(2j * np.pi * (f + 1000.0) * t) for f in offs).astype(np.complex64)
    st, y = bank(bank.init_state(), jnp.asarray(x))
    y = np.asarray(y)
    assert y.shape == (4, bank.out_count(n))
    for c in range(4):
        seg = y[c][y.shape[1] // 2:]
        spec = np.abs(np.fft.fft(seg))
        freqs = np.fft.fftfreq(len(seg), 1 / fs_out)
        k = np.argmax(spec)
        assert abs(freqs[k] - 1000.0) < 20.0, (c, freqs[k])


def test_scanner_bank_sharded_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    fs_in = 1024000.0
    offs = np.linspace(-400000.0, 400000.0, 16)
    bank = ScannerBank(offs, fs_in, mode="usb", if_rate=32000.0, bandwidth=2700.0)
    n = bank.block_multiple * max(1, 32768 // bank.block_multiple)
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64) * 0.1

    # Unsharded result
    st = bank.init_state()
    st1, y1 = jax.jit(bank)(st, jnp.asarray(x))

    # Sharded over an 8-device channel mesh
    mesh = make_mesh(8, 1)
    st_sh, in_sh, out_sh = bank.shard(mesh, bank.init_state())
    step = jax.jit(bank, in_shardings=(None, in_sh), out_shardings=(None, out_sh))
    st2, y2 = step(st_sh, jax.device_put(jnp.asarray(x), in_sh))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    # Output really is distributed over 8 devices.
    assert len(y2.sharding.device_set) == 8


def test_scanner_bank_audio_content():
    fs_in = 256000.0
    offs = np.array([32000.0, -64000.0])
    bank = ScannerBank(offs, fs_in, mode="am", if_rate=32000.0, bandwidth=12000.0)
    n = bank.block_multiple * max(1, 131072 // bank.block_multiple)
    t = np.arange(n) / fs_in
    # AM signal on channel 0 only.
    iq = (0.5 * (1 + 0.5 * np.sin(2 * np.pi * 1000.0 * t))
          * np.exp(2j * np.pi * 32000.0 * t)).astype(np.complex64)
    st, audio = jax.jit(bank)(bank.init_state(), jnp.asarray(iq))
    audio = np.asarray(audio)
    # Channel 0 has the 1 kHz tone, channel 1 mostly noise/DC.
    a0 = audio[0] - audio[0].mean()
    S = np.abs(np.fft.rfft(a0[len(a0) // 2:]))
    freqs = np.fft.rfftfreq(len(a0) - len(a0) // 2, 1 / 32000.0)
    assert abs(freqs[np.argmax(S)] - 1000.0) < 20.0


def test_multihost_single_process_path():
    # Single-process degenerate case of the pod plumbing: global mesh over
    # the 8 virtual devices, per-host file sharding helper.
    from sdrpp_tpu.parallel.multihost import (MultiHostReceiver,
                                              host_shard_paths)
    assert host_shard_paths(["a", "b", "c", "d", "e"], 1, 2) == ["b", "d"]
    fs = 1024000.0
    offs = np.linspace(-400000.0, 400000.0, 16)
    rx = MultiHostReceiver(offs, fs, mode="nfm", if_rate=32000.0)
    n = rx.block_multiple * max(1, 32768 // rx.block_multiple)
    rng = np.random.default_rng(0)
    iq = (0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex64)
    audio = rx.process_block(iq)
    assert audio.shape[0] == 16
    assert len(audio.sharding.device_set) == len(jax.devices())


def test_scanner_bank_wfm_stereo_stations():
    """Multi-station broadcast-FM stereo bank: each channel recovers its
    own L/R tones with >20 dB separation."""
    import jax
    import jax.numpy as jnp

    from sdrpp_tpu.parallel.vfo_bank import ScannerBank

    fs = 1920000.0
    n = 1 << 19
    t = np.arange(n) / fs
    offsets = np.array([-500000.0, 0.0, 400000.0])
    tones = [(1000.0, 2000.0), (700.0, 1500.0), (1200.0, 300.0)]
    iq = np.zeros(n, np.complex64)
    for off, (fl, fr) in zip(offsets, tones):
        L = 0.8 * np.sin(2 * np.pi * fl * t)
        R = 0.8 * np.sin(2 * np.pi * fr * t)
        mpx = (0.45 * (L + R)
               + 0.45 * (L - R) * np.sin(2 * np.pi * 38000.0 * t)
               + 0.1 * np.sin(2 * np.pi * 19000.0 * t))
        iq += (np.exp(1j * (2 * np.pi * off * t
                            + np.cumsum(2 * np.pi * 75000.0 * mpx / fs)))
               / 3).astype(np.complex64)

    bank = ScannerBank(offsets, fs, mode="wfm", if_rate=240000.0,
                       bandwidth=200000.0)
    block = (n // bank.block_multiple) * bank.block_multiple
    st = bank.init_state()
    st, audio = jax.jit(bank)(st, jnp.asarray(iq[:block]))
    audio = np.asarray(audio)
    assert audio.shape[0] == 3 and audio.shape[-1] == 2

    def tone_p(x, f):
        sp = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
        k = int(round(f * len(x) / 48000.0))
        return sp[k - 3:k + 4].sum()

    for c, (fl, fr) in enumerate(tones):
        L = audio[c, 4800:, 0].astype(np.float64)
        R = audio[c, 4800:, 1].astype(np.float64)
        sep_l = 10 * np.log10(tone_p(L, fl) / max(tone_p(L, fr), 1e-12))
        sep_r = 10 * np.log10(tone_p(R, fr) / max(tone_p(R, fl), 1e-12))
        assert sep_l > 20 and sep_r > 20, (c, sep_l, sep_r)
