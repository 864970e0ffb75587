"""Static sample delay (reference: core/src/dsp/math/delay.h:47-61).

Used by the WFM stereo decoder to time-align the L+R and L-R paths with the
pilot filter's group delay. State = last ``delay`` samples of the previous
block; output = [state, x[:-delay]].
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.blocks import Block

__all__ = ["Delay", "delay_block"]


def delay_block(state, x, delay: int):
    if delay == 0:
        return state, x
    buf = jnp.concatenate([state, x], axis=-1)
    y = buf[..., : x.shape[-1]]
    new_state = buf[..., x.shape[-1]:]
    return new_state, y


class Delay(Block):
    def __init__(self, delay: int, dtype=jnp.float32, lead_shape=()):
        self.delay = int(delay)
        self.dtype = dtype
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        return jnp.zeros((*self.lead_shape, self.delay), dtype=self.dtype)

    def __call__(self, state, x):
        return delay_block(state, x, self.delay)
