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
    ``samplerate`` is None."""

    def __init__(self, deviation: float, samplerate: float | None = None, lead_shape=()):
        dev = hz_to_rads(deviation, samplerate) if samplerate is not None else deviation
        self.inv_deviation = 1.0 / dev
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        return jnp.zeros((*self.lead_shape, 1), dtype=jnp.complex64)

    def __call__(self, state, x):
        return quadrature_demod(state, x, self.inv_deviation)
