"""Pallas strided decimating-FIR (ops/fir_pallas): bit-parity with the
XLA polyphase form. The kernel is a measured NEGATIVE result on the
current chip (2.0-2.1 vs 4.8-5.2 Gsamp/s — see PERFORMANCE.md r5) and
is opt-in via SDRPP_TPU_DECIM_PALLAS=1; the parity contract keeps it
correct for hardware where the balance differs."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("SDRPP_TPU_PALLAS_INTERPRET", "1")


def test_pallas_decim_matches_xla_across_blocks():
    from sdrpp_tpu.ops.fir import decimating_fir_correlate, fir_init_tail
    from sdrpp_tpu.ops.fir_pallas import ROWS, decimating_fir_pallas
    from sdrpp_tpu.ops.resample import decim_plan

    r, taps = decim_plan(256)[0]  # the /32 143-tap stage
    n = r * ROWS
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(2 * n) + 1j * rng.standard_normal(2 * n)) \
        .astype(np.complex64)
    t1 = fir_init_tail(taps.shape[0])
    t2 = fir_init_tail(taps.shape[0])
    for blk in (x[:n], x[n:]):
        xb = jnp.asarray(blk)
        t1, y1 = decimating_fir_correlate(t1, xb, taps, r)
        t2, y2 = decimating_fir_pallas(t2, xb, taps, r)
        assert np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)
    assert np.allclose(np.asarray(t1), np.asarray(t2))


def test_power_decimator_engages_pallas_only_when_forced(monkeypatch):
    from sdrpp_tpu.ops import resample as rs
    from sdrpp_tpu.ops.fir_pallas import ROWS

    n = 32 * ROWS
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal(n).astype(np.float32)
                    .astype(np.complex64))
    pd = rs.PowerDecimator(256)
    monkeypatch.setattr(rs, "DECIM_PALLAS", "0")
    _, y_off = pd(pd.init_state(), x)
    monkeypatch.setattr(rs, "DECIM_PALLAS", "1")
    _, y_on = pd(pd.init_state(), x)
    assert np.allclose(np.asarray(y_off), np.asarray(y_on), atol=1e-4)
