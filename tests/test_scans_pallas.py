"""Pallas sequential-loop kernels: exact equivalence vs lax.scan blocks."""

import numpy as np
import jax
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


def test_costas_pallas_matches_scan():
    from sdrpp_tpu.ops.scans import Costas
    from sdrpp_tpu.ops.scans_pallas import CostasPallas

    rng = np.random.default_rng(3)
    n = 4096
    for order in (2, 4, 8):
        # noisy rotating M-PSK constellation
        symbols = rng.integers(0, order, n)
        ph = 2 * np.pi * symbols / order + 0.02 * np.arange(n) + 0.3
        x = (np.exp(1j * ph) + 0.05 * (rng.standard_normal(n)
             + 1j * rng.standard_normal(n))).astype(np.complex64)
        ref = Costas(order, 0.01)
        pal = CostasPallas(order, 0.01, interpret=True)
        s1, s2 = ref.init_state(), pal.init_state()
        for blk in (x[:2048], x[2048:]):
            s1, y1 = ref(s1, jnp.asarray(blk))
            s2, y2 = pal(s2, jnp.asarray(blk))
            # the kernel's inline rotation contracts differently (FMA)
            # than XLA's complex multiply: ULP-level tolerance, not exact
            np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                       rtol=0, atol=1e-4)
        assert abs(float(s1["phase"]) - float(s2["phase"])) < 1e-3
        assert abs(float(s1["freq"]) - float(s2["freq"])) < 1e-4


def test_costas_pallas_falls_back_on_batched_input():
    from sdrpp_tpu.ops.scans_pallas import CostasPallas

    rng = np.random.default_rng(4)
    x = (rng.standard_normal((3, 512)) + 1j * rng.standard_normal((3, 512))) \
        .astype(np.complex64)
    pal = CostasPallas(4, 0.01, interpret=True, lead_shape=(3,))
    st, y = pal(pal.init_state(), jnp.asarray(x))
    assert y.shape == (3, 512)


def test_pallas_carry_correct_for_non_chunk_multiple_blocks():
    """Padded tail samples must not advance the carry: block lengths that
    aren't multiples of the SMEM chunk previously corrupted the state
    handed to the next block."""
    from sdrpp_tpu.ops.scans import PLL
    from sdrpp_tpu.ops.scans_pallas import PLLPallas

    rng = np.random.default_rng(3)
    for n in (100, 8192, 10000, 20000):
        x = np.exp(1j * rng.uniform(-np.pi, np.pi, n)).astype(np.complex64)
        ref = PLL(bandwidth=0.01, init_freq=0.5)
        pal = PLLPallas(bandwidth=0.01, init_freq=0.5, interpret=True)
        s1, y1 = ref(ref.init_state(), jnp.asarray(x))
        s2, y2 = pal(pal.init_state(), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)
        assert abs(float(s1["phase"]) - float(s2["phase"])) < 1e-4, n
        assert abs(float(s1["freq"]) - float(s2["freq"])) < 1e-5, n


def test_lane_batched_kernels_match_lax_scan():
    """[C, n] inputs route to the lane-batched kernel (channels in VPU
    lanes); outputs and carries must match the lax.scan forms."""
    from sdrpp_tpu.ops import scans as S
    from sdrpp_tpu.ops import scans_pallas as SP

    rng = np.random.default_rng(5)
    C, n = 5, 5000  # odd channel count, non-chunk-multiple length
    x = (rng.standard_normal((C, n))
         + 1j * rng.standard_normal((C, n))).astype(np.complex64) * 0.7

    pairs = [
        (S.PLL(bandwidth=0.01, init_freq=0.3, lead_shape=(C,)),
         SP.PLLPallas(bandwidth=0.01, init_freq=0.3, lead_shape=(C,),
                      interpret=True)),
        (S.Costas(2, 0.01, lead_shape=(C,)),
         SP.CostasPallas(2, 0.01, lead_shape=(C,), interpret=True)),
        (S.Costas(4, 0.01, lead_shape=(C,)),
         SP.CostasPallas(4, 0.01, lead_shape=(C,), interpret=True)),
        (S.FastAGC(1.0, 10.0, 0.01, lead_shape=(C,)),
         SP.FastAGCPallas(1.0, 10.0, 0.01, lead_shape=(C,), interpret=True)),
        (S.AGC(1.0, 0.1, 0.01, 1000.0, 1.0, lead_shape=(C,)),
         SP.AGCPallas(1.0, 0.1, 0.01, 1000.0, 1.0, lead_shape=(C,),
                      interpret=True)),
    ]
    for ref, pal in pairs:
        s1, y1 = ref(ref.init_state(), jnp.asarray(x))
        s2, y2 = pal(pal.init_state(), jnp.asarray(x))
        name = type(ref).__name__
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=2e-4, rtol=2e-4, err_msg=name)
        for leaf1, leaf2 in zip(jax.tree_util.tree_leaves(s1),
                                jax.tree_util.tree_leaves(s2)):
            np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf2),
                                       atol=2e-4, err_msg=name)
