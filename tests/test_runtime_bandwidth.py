"""Bandwidth as runtime STATE (VERDICT r4 #3): a RadioChannel built with
dynamic_bandwidth=True must (a) match the static-graph channel at the
same bandwidth sample-for-sample, and (b) retarget to ANY bandwidth via
set_bandwidth_state — a host tap design + state write, no re-trace —
mirroring the reference's state-preserving FIR::setTaps hot-swap
(core/src/dsp/filter/fir.h:31-52, radio_module.h:461-471)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdrpp_tpu.models.radio import RadioChannel
from sdrpp_tpu.ops.fir import FIR, RuntimeFIR


def _tone_iq(fs, f_ch, dev, f_aud, n, seed=0):
    t = np.arange(n) / fs
    audio = np.sin(2 * np.pi * f_aud * t)
    ph = 2 * np.pi * f_ch * t + np.cumsum(2 * np.pi * dev * audio / fs)
    rng = np.random.default_rng(seed)
    return (np.exp(1j * ph) + 0.001 * (rng.standard_normal(n)
            + 1j * rng.standard_normal(n))).astype(np.complex64)


def test_runtime_fir_matches_static_fir():
    """Front-padded runtime taps are sample-for-sample the static FIR —
    including across block seams (the preserved delay line)."""
    from sdrpp_tpu.ops import taps as taps_mod

    t = taps_mod.low_pass(6250.0, 625.0, 48000.0)
    fir = FIR(t, dtype=jnp.complex64)
    rfir = RuntimeFIR(1024, t, dtype=jnp.complex64)
    assert t.shape[0] < 1024
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)) \
        .astype(np.complex64)
    s1, s2 = fir.init_state(), rfir.init_state()
    outs1, outs2 = [], []
    for blk in (x[:4096], x[4096:]):
        s1, y1 = fir(s1, jnp.asarray(blk))
        s2, y2 = rfir(s2, jnp.asarray(blk))
        outs1.append(np.asarray(y1))
        outs2.append(np.asarray(y2))
    y1 = np.concatenate(outs1)
    y2 = np.concatenate(outs2)
    assert np.allclose(y1, y2, atol=2e-4), np.abs(y1 - y2).max()


def test_runtime_fir_float_input():
    from sdrpp_tpu.ops import taps as taps_mod

    t = taps_mod.low_pass(5000.0, 1000.0, 48000.0)
    fir = FIR(t, dtype=jnp.float32)
    rfir = RuntimeFIR(512, t, dtype=jnp.float32)
    x = np.random.default_rng(2).standard_normal(4096).astype(np.float32)
    _, y1 = fir(fir.init_state(), jnp.asarray(x))
    _, y2 = rfir(rfir.init_state(), jnp.asarray(x))
    assert np.allclose(np.asarray(y1), np.asarray(y2), atol=2e-4)


def test_runtime_fir_rejects_oversize_taps():
    from sdrpp_tpu.ops.fir import pad_taps_front

    with pytest.raises(ValueError):
        pad_taps_front(np.ones(300, np.float32), 256)


@pytest.mark.parametrize("mode,bw", [
    ("nfm", 9000.0), ("am", 8000.0), ("usb", 2400.0), ("wfm", 150000.0),
])
def test_dynamic_channel_matches_static_at_same_bandwidth(mode, bw):
    fs = 960000.0
    n = 96000
    iq = _tone_iq(fs, 0.0, bw / 4, 1000.0, 2 * n)

    kw = dict(in_samplerate=fs, offset=0.0, bandwidth=bw, audio_rate=48000.0)
    stat = RadioChannel(mode, **kw)
    dyn = RadioChannel(mode, dynamic_bandwidth=True, **kw)
    bm = max(stat.block_multiple, dyn.block_multiple)
    nb = (n // bm) * bm

    def run(chan):
        step = jax.jit(chan)
        st = chan.init_state()
        outs = []
        for blk in (iq[:nb], iq[nb:2 * nb]):
            st, y = step(st, jnp.asarray(blk))
            outs.append(np.asarray(y))
        return np.concatenate(outs, axis=0)

    y_s, y_d = run(stat), run(dyn)
    assert y_s.shape == y_d.shape
    # the first ~max_taps-worth of output demodulates the zeroed filter
    # tails (numerical noise through atan2, whose wraps amplify fp-level
    # differences from the different overlap-save FFT lengths); compare
    # steady state — measured 2.4e-7 max err for NFM after the transient
    cut = len(y_s) // 8
    scale = max(np.abs(y_s).max(), 1e-6)
    assert np.allclose(y_s[cut:], y_d[cut:], atol=5e-4 * scale), \
        np.abs(y_s[cut:] - y_d[cut:]).max() / scale


def test_set_bandwidth_is_a_state_write_and_takes_effect():
    """Narrowing the bandwidth at runtime must actually attenuate
    out-of-band audio — and produce the SAME output as a channel built
    statically at the new bandwidth (after the filter transient)."""
    fs = 960000.0
    f_aud = 6000.0  # inside 16 kHz audio band, outside 4 kHz band
    n = 96000
    iq = _tone_iq(fs, 0.0, 4000.0, f_aud, 4 * n)

    dyn = RadioChannel("nfm", fs, offset=0.0, bandwidth=16000.0,
                       audio_rate=48000.0, dynamic_bandwidth=True)
    bm = dyn.block_multiple
    nb = (n // bm) * bm
    step = jax.jit(dyn)
    st = dyn.init_state()
    st, y_wide = step(st, jnp.asarray(iq[:nb]))
    # runtime narrow: 6 kHz tone now beyond bw/2 = 2 kHz cutoff
    st = dyn.set_bandwidth_state(st, 4000.0)
    st, _trans = step(st, jnp.asarray(iq[nb:2 * nb]))
    st, y_narrow = step(st, jnp.asarray(iq[2 * nb:3 * nb]))
    wide_amp = np.abs(np.asarray(y_wide)[2000:]).max()
    narrow_amp = np.abs(np.asarray(y_narrow)).max()
    assert narrow_amp < 0.2 * wide_amp, (wide_amp, narrow_amp)

    # and the narrowed dynamic channel tracks a static 4 kHz channel
    stat = RadioChannel("nfm", fs, offset=0.0, bandwidth=4000.0,
                        audio_rate=48000.0)
    sst = stat.init_state()
    sstep = jax.jit(stat)
    for i in range(3):
        sst, y_stat = sstep(sst, jnp.asarray(iq[i * nb:(i + 1) * nb]))
    st, y_dyn = step(st, jnp.asarray(iq[3 * nb:4 * nb]))
    sst, y_stat = sstep(sst, jnp.asarray(iq[3 * nb:4 * nb]))
    y_dyn, y_stat = np.asarray(y_dyn), np.asarray(y_stat)
    scale = max(np.abs(y_stat).max(), 1e-6)
    assert np.allclose(y_dyn, y_stat, atol=1e-3 * scale), \
        np.abs(y_dyn - y_stat).max() / scale


def test_set_bandwidth_clamps_to_mode_range():
    dyn = RadioChannel("nfm", 960000.0, bandwidth=12500.0,
                       audio_rate=48000.0, dynamic_bandwidth=True)
    st = dyn.init_state()
    dyn.set_bandwidth_state(st, 1.0)  # clamped to 1000, must not raise
    assert dyn.bandwidth == 1000.0
    dyn.set_bandwidth_state(st, 1e9)  # clamped to if_rate
    assert dyn.bandwidth == dyn.if_rate


def test_static_channel_rejects_set_bandwidth():
    stat = RadioChannel("nfm", 960000.0, bandwidth=12500.0,
                        audio_rate=48000.0)
    with pytest.raises(ValueError):
        stat.set_bandwidth_state(stat.init_state(), 9000.0)


def test_dynamic_bandwidth_state_has_no_retrace():
    """set_bandwidth_state only rewrites leaves — pytree structure and
    shapes are unchanged, so the SAME jitted executable keeps running
    (the no-re-jit property the webui test then verifies end to end)."""
    dyn = RadioChannel("usb", 960000.0, bandwidth=2700.0,
                       audio_rate=48000.0, dynamic_bandwidth=True)
    st = dyn.init_state()
    st2 = dyn.set_bandwidth_state(st, 1800.0)
    d1 = jax.tree_util.tree_structure(st)
    d2 = jax.tree_util.tree_structure(st2)
    assert d1 == d2
    shapes1 = [np.shape(x) for x in jax.tree_util.tree_leaves(st)]
    shapes2 = [np.shape(x) for x in jax.tree_util.tree_leaves(st2)]
    assert shapes1 == shapes2
