"""Time-axis sharding: halo/carry correctness vs single-device reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdrpp_tpu.ops import taps as taps_mod
from sdrpp_tpu.ops.fir import FIR
from sdrpp_tpu.ops.fm import Quadrature
from sdrpp_tpu.ops.mix import FrequencyXlator, hz_to_rads
from sdrpp_tpu.ops.scans import DCBlocker
from sdrpp_tpu.parallel.time_shard import (make_time_step_nfm,
                                           sharded_affine_scan, sharded_fir,
                                           sharded_mix, sharded_quadrature)

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _mesh(p=8):
    return Mesh(np.array(jax.devices()[:p]).reshape(p), axis_names=("time",))


@needs8
def test_sharded_fir_matches_unsharded():
    rng = np.random.default_rng(0)
    t = taps_mod.low_pass(3000.0, 1000.0, 48000.0)
    n = 8 * 2048
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    mesh = _mesh()

    fn = jax.jit(jax.shard_map(
        lambda tail, xl: sharded_fir(tail, xl, t),
        mesh=mesh, in_specs=(P(), P("time")), out_specs=(P(), P("time"))))

    tail = jnp.zeros(len(t) - 1, jnp.complex64)
    tail, y1 = fn(tail, jnp.asarray(x[:n]))
    # second block continues the carry
    tail, y2 = fn(tail, jnp.asarray(x))

    ref = FIR(t, dtype=jnp.complex64)
    st = ref.init_state()
    st, r1 = ref(st, jnp.asarray(x))
    st, r2 = ref(st, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(r1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(r2), atol=2e-4)


@needs8
def test_sharded_affine_scan_matches_dc_blocker():
    rng = np.random.default_rng(1)
    rate = 0.002
    n = 8 * 1024
    x = (rng.standard_normal(n) + 0.4).astype(np.float32)
    mesh = _mesh()
    a = np.float32(1.0 - rate)

    fn = jax.jit(jax.shard_map(
        lambda y0, b: sharded_affine_scan(a, b, y0),
        mesh=mesh, in_specs=(P(), P("time")), out_specs=(P(), P("time"))))
    yf, offs = fn(jnp.float32(0.0), jnp.asarray(np.float32(rate) * x))

    # reference: offset recurrence from DCBlocker
    ref = DCBlocker(rate, dtype=jnp.float32)
    st, y_ref = ref(ref.init_state(), jnp.asarray(x))
    # offs[i] should equal the offset AFTER sample i = x[i] - y[i] + rate*y...
    # easier: recompute offsets directly
    offset = 0.0
    want = np.zeros(n, np.float32)
    for i in range(n):
        offset = (1 - rate) * offset + rate * x[i]
        want[i] = offset
    np.testing.assert_allclose(np.asarray(offs), want, rtol=1e-4, atol=1e-5)
    assert abs(float(yf) - want[-1]) < 1e-5


@needs8
def test_sharded_mix_matches_xlator():
    fs, f = 48000.0, 1234.5
    n = 8 * 1000
    x = np.ones(n, np.complex64)
    mesh = _mesh()
    omega = hz_to_rads(f, fs)
    shard_len = n // 8

    fn = jax.jit(jax.shard_map(
        lambda ph, xl: sharded_mix(ph, xl, omega, shard_len),
        mesh=mesh, in_specs=(P(), P("time")), out_specs=(P(), P("time"))))
    ph = jnp.zeros((), jnp.float32)
    ph, y1 = fn(ph, jnp.asarray(x))
    ph, y2 = fn(ph, jnp.asarray(x))
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    want = np.exp(1j * omega * np.arange(2 * n))
    np.testing.assert_allclose(got, want, atol=2e-3)


@needs8
def test_sharded_quadrature_matches():
    fs, dev = 48000.0, 5000.0
    n = 8 * 1024
    t = np.arange(2 * n) / fs
    audio = np.sin(2 * np.pi * 700.0 * t)
    x = np.exp(1j * np.cumsum(2 * np.pi * dev * audio / fs)).astype(np.complex64)
    mesh = _mesh()
    inv_dev = 1.0 / hz_to_rads(dev, fs)

    fn = jax.jit(jax.shard_map(
        lambda last, xl: sharded_quadrature(last, xl, inv_dev),
        mesh=mesh, in_specs=(P(), P("time")), out_specs=(P(), P("time"))))
    last = jnp.zeros(1, jnp.complex64)
    last, y1 = fn(last, jnp.asarray(x[:n]))
    last, y2 = fn(last, jnp.asarray(x[n:]))
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])

    ref = Quadrature(dev, fs)
    st = ref.init_state()
    st, r1 = ref(st, jnp.asarray(x[:n]))
    st, r2 = ref(st, jnp.asarray(x[n:]))
    want = np.concatenate([np.asarray(r1), np.asarray(r2)])
    np.testing.assert_allclose(got, want, atol=1e-4)


@needs8
def test_time_sharded_nfm_chain():
    fs = 96000.0
    f_ch, dev, f_aud = 20000.0, 5000.0, 1000.0
    mesh = _mesh()
    n = 8 * 8192
    step, init_state = make_time_step_nfm(mesh, f_ch, fs, 12500.0, n)
    t = np.arange(2 * n) / fs
    audio = np.sin(2 * np.pi * f_aud * t)
    iq = np.exp(1j * (2 * np.pi * f_ch * t
                      + np.cumsum(2 * np.pi * dev * audio / fs))).astype(np.complex64)
    st = init_state()
    st, y1 = step(st, jnp.asarray(iq[:n]))
    st, y2 = step(st, jnp.asarray(iq[n:]))
    y = np.concatenate([np.asarray(y1), np.asarray(y2)])
    seg = y[len(y) // 2:] - np.mean(y[len(y) // 2:])
    S = np.abs(np.fft.rfft(seg * np.hanning(len(seg)))) ** 2
    freqs = np.fft.rfftfreq(len(seg), 1 / fs)
    k = np.argmax(S[3:]) + 3
    assert abs(freqs[k] - f_aud) < 5.0
    sig = S[k - 3: k + 4].sum()
    snr = 10 * np.log10(sig / (S[3:].sum() - sig))
    assert snr > 25, snr
