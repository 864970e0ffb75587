"""TX modulators (core/src/dsp/mod/)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdrpp_tpu.ops.fm import Quadrature
from sdrpp_tpu.ops.modulators import GFSKMod, PSKMod, QuadratureMod


def _oracle_quadrature_mod(x, dev_rads):
    """Per-sample reference loop (mod/quadrature.h:44-49)."""
    phase = 0.0
    out = np.empty(len(x), np.complex64)
    for i, v in enumerate(x):
        phase += dev_rads * v
        phase = (phase + np.pi) % (2 * np.pi) - np.pi
        out[i] = np.cos(phase) + 1j * np.sin(phase)
    return out


def test_quadrature_mod_matches_per_sample_oracle():
    rng = np.random.default_rng(0)
    fs, dev = 48000.0, 5000.0
    x = rng.normal(0, 0.7, 4096).astype(np.float32)
    m = QuadratureMod(dev, fs)
    st = m.init_state()
    st, out = jax.jit(m)(st, jnp.asarray(x))
    oracle = _oracle_quadrature_mod(x, 2 * np.pi * dev / fs)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=2e-3)


def test_quadrature_mod_phase_carry_across_blocks():
    rng = np.random.default_rng(1)
    fs, dev = 48000.0, 5000.0
    x = rng.normal(0, 0.7, 4096).astype(np.float32)
    m = QuadratureMod(dev, fs)
    st = m.init_state()
    st, a = m(st, jnp.asarray(x[:2048]))
    st, b = m(st, jnp.asarray(x[2048:]))
    split = np.concatenate([np.asarray(a), np.asarray(b)])
    _, whole = m(m.init_state(), jnp.asarray(x))
    np.testing.assert_allclose(split, np.asarray(whole), atol=2e-3)


def test_quadrature_mod_roundtrips_through_discriminator():
    rng = np.random.default_rng(2)
    fs, dev = 48000.0, 5000.0
    x = np.sin(2 * np.pi * 1000.0 * np.arange(9600) / fs).astype(np.float32)
    m = QuadratureMod(dev, fs)
    _, iq = m(m.init_state(), jnp.asarray(x))
    d = Quadrature(dev, fs)
    _, y = d(d.init_state(), iq)
    np.testing.assert_allclose(np.asarray(y)[1:], x[1:], atol=1e-2)


def test_psk_mod_shapes_symbols():
    rng = np.random.default_rng(3)
    m = PSKMod(1200.0, 12000.0, 0.35, 31)
    nsym = 64
    sym = np.exp(1j * np.pi / 2 * rng.integers(0, 4, nsym)).astype(np.complex64)
    pad = (-nsym) % m.block_multiple
    sym = np.concatenate([sym, np.zeros(pad, np.complex64)])
    st, out = m(m.init_state(), jnp.asarray(sym))
    assert out.shape[-1] == m.out_count(len(sym)) == len(sym) * 10
    assert np.isfinite(np.asarray(out)).all()


def test_gfsk_mod_end_to_end_bits():
    """GFSKMod -> GFSKDemod recovers the bit stream."""
    from sdrpp_tpu.models.digital import GFSKDemod

    rng = np.random.default_rng(4)
    fs, baud, dev = 9600.0, 1200.0, 1200.0
    bits = rng.integers(0, 2, 600) * 2.0 - 1.0
    m = GFSKMod(baud, fs, 0.5, 31, dev)
    sym = bits.astype(np.float32)
    pad = (-len(sym)) % m.block_multiple
    sym = np.concatenate([sym, np.zeros(pad, np.float32)])
    _, iq = m(m.init_state(), jnp.asarray(sym))

    d = GFSKDemod(baud, fs, dev, rrc_tap_count=31, rrc_beta=0.5,
                  omega_gain=0.001, mu_gain=0.01)
    st = d.init_state()
    st, (syms, valid) = jax.jit(d)(st, iq)
    keep = np.asarray(valid).astype(bool)  # mask, not prefix
    got = np.sign(np.asarray(syms)[keep])
    # find the alignment by correlation, then compare the settled middle
    tx = np.sign(bits)
    c = np.correlate(got.astype(np.float32), tx[200:400].astype(np.float32))
    off = int(np.argmax(np.abs(c))) - 200
    polarity = np.sign(c[off + 200]) or 1.0
    a = tx[250:550]
    b = polarity * got[250 + off:550 + off]
    L = min(len(a), len(b))
    assert L > 200
    assert float(np.mean(a[:L] == b[:L])) > 0.95
