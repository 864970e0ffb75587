"""Pallas sequential-loop kernels: exact equivalence vs lax.scan blocks."""

import numpy as np
import jax.numpy as jnp

from sdrpp_tpu.ops.scans import PLL, FastAGC
from sdrpp_tpu.ops.scans_pallas import FastAGCPallas, PLLPallas


def test_pll_pallas_matches_scan():
    fs, f0, n = 48000.0, 1234.0, 4096
    ph = 2 * np.pi * f0 * np.arange(n) / fs + 0.5
    x = np.exp(1j * ph).astype(np.complex64)
    ref = PLL(0.02)
    st1, y1 = ref(ref.init_state(), jnp.asarray(x))
    pal = PLLPallas(0.02, interpret=True)
    st2, y2 = pal(pal.init_state(), jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert float(st1["phase"]) == float(st2["phase"])
    assert float(st1["freq"]) == float(st2["freq"])


def test_fast_agc_pallas_matches_scan_multiblock():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)) \
        .astype(np.complex64)
    ref = FastAGC(1.0, 1e4, 0.01)
    pal = FastAGCPallas(1.0, 1e4, 0.01, interpret=True)
    s1, s2 = ref.init_state(), pal.init_state()
    for blk in (x[:2048], x[2048:]):
        s1, y1 = ref(s1, jnp.asarray(blk))
        s2, y2 = pal(s2, jnp.asarray(blk))
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert float(s1) == float(s2)


def test_agc_pallas_matches_scan():
    from sdrpp_tpu.ops.scans import AGC
    from sdrpp_tpu.ops.scans_pallas import AGCPallas
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(2048) * np.linspace(0.1, 3.0, 2048)) \
        .astype(np.float32)
    x[500] = 80.0  # trigger the look-ahead clip path
    ref = AGC(1.0, 0.1, 0.01, 1e4, 10.0, float("inf"))
    pal = AGCPallas(1.0, 0.1, 0.01, 1e4, 10.0, float("inf"), interpret=True)
    s1, y1 = ref(ref.init_state(), jnp.asarray(x))
    s2, y2 = pal(pal.init_state(), jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert float(s1["amp"]) == float(s2["amp"])
    assert float(s1["gain"]) == float(s2["gain"])
