"""Rational-resampler planning + polyphase path-equivalence regressions."""

import jax
import jax.numpy as jnp
import numpy as np

def test_plan_250k_to_5k_exact_small_interp():
    """Regression: 250 kHz -> 5 kHz must not inherit the reference's
    rounding of the non-integral 32x intermediate (7812.5 Hz), which
    silently planned interp=1250/decim=1953 with a hidden 0.0064% rate
    error (and a graph-exploding 1250-phase bank). The planner backs the
    pre-decimator off to 16x -> 15625 Hz -> interp 8 / decim 25, exact."""
    from sdrpp_tpu.ops.resample import plan_rational_resampler

    p = plan_rational_resampler(250000.0, 5000.0)
    assert p["pre_ratio"] == 16
    assert (p["interp"], p["decim"]) == (8, 25)
    assert p["error_pct"] == 0.0


def test_polyphase_gather_path_matches_grouped():
    """The gather form (used when interp*tpp would unroll too many ops)
    must produce the same samples as the grouped form."""
    from sdrpp_tpu.ops import resample as rs

    rng = np.random.default_rng(11)
    taps = rs.low_pass(2000.0, 400.0, 40000.0)
    x = (rng.standard_normal(3000) + 1j * rng.standard_normal(3000)) \
        .astype(np.complex64)
    r = rs.PolyphaseResampler(4, 5, taps)
    st = r.init_state()
    _, y_grouped = jax.jit(r)(st, jnp.asarray(x))

    old = rs.GROUPED_MAX_UNROLL
    try:
        rs.GROUPED_MAX_UNROLL = 0  # force the gather form
        r2 = rs.PolyphaseResampler(4, 5, taps)
        _, y_gather = jax.jit(r2)(r2.init_state(), jnp.asarray(x))
    finally:
        rs.GROUPED_MAX_UNROLL = old
    np.testing.assert_allclose(np.asarray(y_grouped), np.asarray(y_gather),
                               rtol=0, atol=2e-6)


def test_fir_direct_mode_matches_fft():
    """SDRPP_TPU_FIR=direct (lax.conv correlation, the axon-tunnel path
    where XLA FFT is unimplemented) must match the overlap-save FFT path."""
    from sdrpp_tpu.ops import fir as fir_mod
    from sdrpp_tpu.ops import taps as taps_mod

    rng = np.random.default_rng(21)
    real_taps = taps_mod.low_pass(6000.0, 1200.0, 48000.0)
    cplx_taps = taps_mod.band_pass(300.0, 2700.0, 240.0, 48000.0)
    n = 4096
    xc = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    xf = rng.standard_normal(n).astype(np.float32)

    cases = [
        (real_taps, xc, jnp.complex64),
        (real_taps, xf, jnp.float32),
        (cplx_taps, xc, jnp.complex64),
    ]
    old = fir_mod.FIR_MODE
    try:
        for taps, x, dt in cases:
            fir_mod.FIR_MODE = "fft"
            f1 = fir_mod.FIR(taps, dtype=dt)
            s1, y1 = jax.jit(f1)(f1.init_state(), jnp.asarray(x))
            fir_mod.FIR_MODE = "direct"
            f2 = fir_mod.FIR(taps, dtype=dt)
            s2, y2 = jax.jit(f2)(f2.init_state(), jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                       rtol=0, atol=2e-4)
            np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    finally:
        fir_mod.FIR_MODE = old
