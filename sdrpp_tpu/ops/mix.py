"""Complex NCO mixing (frequency translation) with per-block phase carry.

The reference rotates each sample by an incrementing phasor via VOLK's
rotator, carrying the phase across blocks (reference:
core/src/dsp/channel/frequency_xlator.h:44-48; out[i] = in[i] * phase,
phase *= delta). Here the whole block is mixed at once:
``out[i] = in[i] * exp(j*(phi0 + i*omega))`` and the carry is
``phi0 + n*omega mod 2pi`` — no per-sample recurrence, no magnitude drift
(the VOLK rotator renormalizes periodically; exact exp doesn't need to).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.blocks import Block

__all__ = ["mix", "FrequencyXlator", "hz_to_rads"]

TWO_PI = 2.0 * np.pi


def hz_to_rads(freq: float, samplerate: float) -> float:
    return TWO_PI * (freq / samplerate)


def mix(phase: jax.Array, x: jax.Array, omega: float) -> tuple[jax.Array, jax.Array]:
    """Mix block ``x`` with an NCO at ``omega`` rad/sample starting at ``phase``.

    Returns (new_phase, y). ``phase`` is a float32 scalar (or leading-batch
    array broadcastable against x's leading axes). ``omega`` is static
    configuration, so the per-sample ramp ``(i*omega) mod 2pi`` is precomputed
    on host in float64 and baked in as a float32 constant — exact for
    million-sample blocks without needing x64 inside the graph.
    """
    n = x.shape[-1]
    ramp = jnp.asarray(np.mod(np.arange(n, dtype=np.float64) * float(omega), TWO_PI)
                       .astype(np.float32))
    ph = jnp.mod(phase[..., None] + ramp, np.float32(TWO_PI))
    lo = jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    y = x * lo
    step = np.float32(np.mod(n * float(omega), TWO_PI))
    new_phase = jnp.mod(phase + step, np.float32(TWO_PI))
    return new_phase, y


class FrequencyXlator(Block):
    """Frequency translation block (reference frequency_xlator.h:6-66).

    ``offset_hz`` rotates the spectrum by +offset (the RxVFO passes the
    negated VFO offset to center the channel, reference rx_vfo.h:30).
    """

    def __init__(self, offset_hz: float, samplerate: float, lead_shape=()):
        self.omega = float(hz_to_rads(offset_hz, samplerate))
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        return jnp.zeros(self.lead_shape, dtype=jnp.float32)

    def __call__(self, state, x):
        return mix(state, x, self.omega)
