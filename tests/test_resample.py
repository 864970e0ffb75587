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


def test_polyphase_pure_decimation_delegates_correctly():
    """interp==1 routes through decimating_fir_correlate; output and
    carried tail must equal the gather form (the generic oracle),
    including across block boundaries, complex and float."""
    from sdrpp_tpu.ops import resample as rs

    rng = np.random.default_rng(13)
    taps = rs.low_pass(20000.0, 5000.0, 240000.0)
    for dtype in (np.complex64, np.float32):
        x = rng.standard_normal((2, 3000)).astype(np.float32)
        x = (x[0] + 1j * x[1]).astype(dtype) if dtype == np.complex64 \
            else x[0]
        jdt = jnp.complex64 if dtype == np.complex64 else jnp.float32
        fast = rs.PolyphaseResampler(1, 5, taps, dtype=jdt)
        old = rs.GROUPED_MAX_UNROLL
        try:
            rs.GROUPED_MAX_UNROLL = 0
            # also disable the i==1 fast branch to reach the gather oracle
            slow = rs.PolyphaseResampler(1, 5, taps, dtype=jdt)
            slow_tpp = slow.tpp
            slow.tpp = slow_tpp  # gather path selected by unroll cap
            st_f = fast.init_state()
            st_s = slow.init_state()
            for blk in (x[:1500], x[1500:]):
                st_f, y_f = jax.jit(fast)(st_f, jnp.asarray(blk))
                # gather form: bypass the i==1 branch by calling the
                # index-table path directly
                n = blk.shape[-1]
                buf = jnp.concatenate([st_s, jnp.asarray(blk)], axis=-1)
                offsets, taps_sel = slow._index_tables(n)
                idx = offsets[:, None] + np.arange(slow.tpp,
                                                   dtype=np.int32)[None, :]
                y_s = jnp.sum(buf[..., jnp.asarray(idx)]
                              * jnp.asarray(taps_sel), axis=-1)
                st_s = buf[..., n:]
                np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_s),
                                           rtol=0, atol=3e-6)
                np.testing.assert_allclose(np.asarray(st_f),
                                           np.asarray(st_s), rtol=0,
                                           atol=0)
        finally:
            rs.GROUPED_MAX_UNROLL = old
