"""Distributed 4-step FFT (parallel/dist_fft.py) on the virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from sdrpp_tpu.parallel.dist_fft import (dist_fft, dist_power_spectrum,
                                         shard_input)


def _mesh(d):
    devs = jax.devices()
    if len(devs) < d:
        pytest.skip(f"needs {d} devices")
    return Mesh(np.array(devs[:d]), axis_names=("fft",))


@pytest.mark.parametrize("n,d", [(1 << 12, 4), (1 << 14, 8), (1 << 16, 8)])
def test_dist_fft_matches_numpy(n, d):
    mesh = _mesh(d)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    got = np.asarray(jax.jit(lambda v: dist_fft(v, mesh))(jnp.asarray(x)))
    ref = np.fft.fft(x)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-6)


def test_dist_fft_matrix_form_mapping():
    mesh = _mesh(4)
    n = 1 << 10
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    cmat = np.asarray(jax.jit(
        lambda v: dist_fft(v, mesh, natural=False))(jnp.asarray(x)))
    r, c = cmat.shape
    ref = np.fft.fft(x)
    # C[k1, k2] == X[k1 + r*k2]
    np.testing.assert_allclose(cmat.T.reshape(-1) / np.abs(ref).max(),
                               ref / np.abs(ref).max(), atol=2e-6)


def test_dist_power_spectrum_matches_spectrum_fft():
    """The distributed dB line equals the single-device SpectrumFFT line
    (unity-gain centered window, dB power) for a 64k-bin FFT."""
    from sdrpp_tpu.ops.spectrum import SpectrumFFT

    mesh = _mesh(8)
    size = 1 << 16
    spec = SpectrumFFT(size, float(size), 1.0)  # one frame per block
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(size) + 1j * rng.standard_normal(size)) \
        .astype(np.complex64) * 0.1
    ref = np.asarray(jax.jit(spec)(jnp.asarray(x)))[0]
    got = np.asarray(jax.jit(
        lambda v: dist_power_spectrum(v, spec.window, mesh))(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_shard_input_layout_roundtrip():
    mesh = _mesh(8)
    n = 1 << 14
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    xs = shard_input(x, mesh)
    got = np.asarray(jax.jit(lambda v: dist_fft(v, mesh))(xs))
    ref = np.fft.fft(x)
    np.testing.assert_allclose(got / np.abs(ref).max(),
                               ref / np.abs(ref).max(), atol=2e-6)
