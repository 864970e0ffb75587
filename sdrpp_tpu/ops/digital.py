"""Bit-level digital ops (reference: core/src/dsp/digital/*.h).

These follow the symbol synchronizer, whose block output is a
prefix-valid array (symbols[0:num_valid] real, rest zero-padding). All ops
here operate on the full static-shape array and a valid count/mask; padding
positions produce don't-care values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.blocks import Block

__all__ = ["binary_slicer", "DifferentialDecoder", "manchester_decode"]


def binary_slicer(x):
    """bit = x > 0 (reference: digital/binary_slicer.h:12-17)."""
    return (x > 0).astype(jnp.uint8)


class DifferentialDecoder(Block):
    """out[i] = (in[i] - last + mod) % mod
    (reference: digital/differential_decoder.h:41-46).

    Call with (symbols, num_valid): ``last`` carried across blocks is the
    symbol at index num_valid-1 (or the previous carry when the block is
    empty). Int math is done in int32 and cast back to uint8.
    """

    def __init__(self, modulus: int, init_sym: int = 0):
        self.modulus = int(modulus)
        self.init_sym = int(init_sym)

    def init_state(self):
        return jnp.full((), self.init_sym, jnp.int32)

    def __call__(self, state, inputs):
        syms, num_valid = inputs
        s = syms.astype(jnp.int32)
        prev = jnp.concatenate([state[None], s[:-1]])
        out = ((s - prev + self.modulus) % self.modulus).astype(jnp.uint8)
        new_last = jnp.where(num_valid > 0, s[jnp.maximum(num_valid - 1, 0)], state)
        return new_last, out


def manchester_decode(state_offset, bits, num_valid):
    """Keep every 2nd symbol starting at carried offset parity
    (reference: digital/manchester_decoder.h:20-27). Returns
    (new_offset, decoded[ceil(n/2)], out_valid_count)."""
    n = bits.shape[-1]
    # Positions taken: state_offset, state_offset+2, ... < num_valid
    idx = state_offset + 2 * jnp.arange(n // 2 + 1, dtype=jnp.int32)
    taken = idx < num_valid
    out = jnp.where(taken, bits[jnp.clip(idx, 0, n - 1)], 0)
    out_count = jnp.sum(taken.astype(jnp.int32))
    new_offset = state_offset + 2 * out_count - num_valid
    return new_offset, out.astype(jnp.uint8), out_count
