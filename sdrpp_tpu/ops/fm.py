"""Quadrature FM discriminator.

Reference (core/src/dsp/demod/quadrature.h:42-57, USE_QUAD_FM_DEMOD=1):
out[i] = angle(y[i] * conj(y[i-1])) / deviation. The one-sample shift makes
this embarrassingly parallel: carry = last sample of the previous block.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.blocks import Block
from .mix import hz_to_rads

__all__ = ["quadrature_demod", "Quadrature"]


def quadrature_demod(last: jax.Array, x: jax.Array, inv_deviation: float):
    """FM-discriminate one block; returns (new_last, audio).

    ``last`` is the final sample of the previous block ([..., 1] complex)."""
    prev = jnp.concatenate([last, x[..., :-1]], axis=-1)
    prod = x * jnp.conj(prev)
    y = jnp.arctan2(prod.imag, prod.real) * np.float32(inv_deviation)
    return x[..., -1:], y


class Quadrature(Block):
    """FM discriminator block (reference quadrature.h:10-88).

    ``deviation`` in Hz with ``samplerate``, or in rad/sample when
    ``samplerate`` is None.

    ``dynamic_deviation``: the 1/deviation gain lives in STATE instead of
    being baked into the graph, so a bandwidth change (deviation = bw/2,
    reference setDeviation quadrature.h:60-67) is a scalar state write
    between blocks — no re-jit."""

    def __init__(self, deviation: float, samplerate: float | None = None,
                 lead_shape=(), dynamic_deviation: bool = False):
        dev = hz_to_rads(deviation, samplerate) if samplerate is not None else deviation
        self.inv_deviation = 1.0 / dev
        self.samplerate = samplerate
        self.lead_shape = tuple(lead_shape)
        self.dynamic_deviation = bool(dynamic_deviation)

    def inv_dev_state(self, deviation: float) -> jnp.ndarray:
        """State leaf for a host-side deviation write (Hz when built with
        a samplerate, rad/sample otherwise)."""
        dev = (hz_to_rads(deviation, self.samplerate)
               if self.samplerate is not None else deviation)
        return jnp.float32(1.0 / dev)

    def init_state(self):
        last = jnp.zeros((*self.lead_shape, 1), dtype=jnp.complex64)
        if self.dynamic_deviation:
            return {"last": last,
                    "inv_dev": jnp.float32(self.inv_deviation)}
        return last

    def __call__(self, state, x):
        if self.dynamic_deviation:
            last, y = quadrature_demod(state["last"], x, 1.0)
            return {"last": last, "inv_dev": state["inv_dev"]}, \
                y * state["inv_dev"]
        return quadrature_demod(state, x, self.inv_deviation)
