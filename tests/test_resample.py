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
