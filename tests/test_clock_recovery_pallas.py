"""Pallas MM clock recovery == lax.scan MM (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdrpp_tpu.ops.clock_recovery import MMClockRecovery
from sdrpp_tpu.ops.clock_recovery_pallas import _CHUNK, MMClockRecoveryPallas


def _signal(rng, n, sps, cplx):
    nsym = int(n / sps) + 4
    if cplx:
        sym = (rng.integers(0, 2, nsym) * 2 - 1
               + 1j * (rng.integers(0, 2, nsym) * 2 - 1)).astype(np.complex64)
    else:
        sym = (rng.integers(0, 2, nsym) * 2.0 - 1.0).astype(np.float32)
    idx = np.minimum((np.arange(n) / sps).astype(np.int64), nsym - 1)
    x = sym[idx]
    x += (rng.normal(0, 0.05, n) * (1 + 1j if cplx else 1)).astype(x.dtype)
    return x


@pytest.mark.parametrize("cplx", [False, True])
def test_pallas_mm_matches_scan(cplx):
    rng = np.random.default_rng(0 if cplx else 1)
    sps = 2.5
    n = 2 * _CHUNK  # crosses a chunk boundary
    x = _signal(rng, n, sps, cplx)

    base = MMClockRecovery(sps, 0.001, 0.01, 0.01, complex_input=cplx)
    pall = MMClockRecoveryPallas(sps, 0.001, 0.01, 0.01, complex_input=cplx,
                                 interpret=True)

    sb = base.init_state()
    sp = pall.init_state()
    for blk in (x[:n // 2], x[n // 2:]):
        sb, (ys, vs) = base(sb, jnp.asarray(blk))
        sp, (yp, vp) = pall(sp, jnp.asarray(blk))
        nb = int(np.asarray(vs).sum())
        npv = int(np.asarray(vp).sum())
        assert nb == npv
        np.testing.assert_allclose(np.asarray(yp)[:npv], np.asarray(ys)[:nb],
                                   rtol=0, atol=2e-5)
    # carried state equivalence
    for k in sb:
        np.testing.assert_allclose(np.asarray(sb[k]), np.asarray(sp[k]),
                                   rtol=0, atol=2e-5)


def test_pallas_mm_falls_back_on_odd_lengths():
    mm = MMClockRecoveryPallas(2.5, 0.001, 0.01, 0.01, complex_input=False,
                               interpret=True)
    x = jnp.asarray(np.random.default_rng(2).normal(0, 1, 1000)
                    .astype(np.float32))
    st, (syms, valid) = mm(mm.init_state(), x)  # 1000 < _CHUNK -> c=1000
    assert syms.shape == valid.shape


def test_pallas_mm_in_gfsk_chain():
    """GFSK demod with the Pallas MM recovers the same bits."""
    from sdrpp_tpu.models.digital import GFSKDemod

    rng = np.random.default_rng(3)
    sps, nsym = 8, 1024
    bits = rng.integers(0, 2, nsym) * 2.0 - 1.0
    wave = np.repeat(bits, sps)
    fs, dev = float(sps), 0.25 * sps
    phase = np.cumsum(2 * np.pi * dev * wave / fs)
    x = np.exp(1j * phase).astype(np.complex64)

    d = GFSKDemod(1.0, fs, dev, rrc_tap_count=31, rrc_beta=0.5,
                  omega_gain=0.001, mu_gain=0.01)
    d.recov = MMClockRecoveryPallas(fs / 1.0, 0.001, 0.01, 0.01,
                                    complex_input=False, interpret=True)
    st = d.init_state()
    st, (syms, valid) = d(st, jnp.asarray(x))
    nv = int(np.asarray(valid).sum())
    got = np.asarray(syms)[nv // 2: nv]
    assert np.mean(np.abs(got) > 0.2) > 0.9


def test_meteor_costas_pallas_matches_scan():
    from sdrpp_tpu.models.digital import MeteorCostas
    from sdrpp_tpu.ops.scans_pallas import costas_phases_pallas

    rng = np.random.default_rng(4)
    n = 4096
    x = (np.exp(1j * (np.pi / 4 + np.pi / 2
                      * rng.integers(0, 4, n)))
         + 0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))
         ).astype(np.complex64)
    for broken in (False, True):
        c = MeteorCostas(0.01, broken_modulation=broken)
        st, ref = c(c.init_state(), jnp.asarray(x))
        out_phases, ph, fr = costas_phases_pallas(
            jnp.asarray(x.real), jnp.asarray(x.imag),
            jnp.float32(0), jnp.float32(0),
            "meteor" if broken else 4, c.alpha, c.beta,
            c.min_freq, c.max_freq, interpret=True)
        lo = jax.lax.complex(jnp.cos(-out_phases), jnp.sin(-out_phases))
        got = np.asarray(jnp.asarray(x) * lo)
        np.testing.assert_allclose(got, np.asarray(ref), atol=2e-4)
        np.testing.assert_allclose(float(ph), float(st["phase"]), atol=2e-4)
