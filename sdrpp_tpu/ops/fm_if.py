"""FM IF noise reduction: per-sample sliding-FFT max-bin filter.

Reference: core/src/dsp/noise_reduction/fm_if.h:45-77 — for EVERY sample, a
``bins``-point windowed FFT of the trailing window, keep only the
highest-magnitude bin, inverse FFT, take the center sample. The reference
brute-forces one forward+inverse FFTW pair per sample; here the whole block
becomes one batched [count, bins] FFT (SURVEY §2.7: "actually a great
MXU/VPU fit").

Math shortcut for the inverse: with a single nonzero bin k, the
unnormalized FFTW backward transform at index N/2 is X_k * e^{i*pi*k}
= X_k * (-1)^k — no second FFT needed.

Window: nuttall(i, bins-1) (note the N-1 denominator, fm_if.h:112).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.blocks import Block
from .windows import nuttall

__all__ = ["FMIFNoiseReduction"]


class FMIFNoiseReduction(Block):
    def __init__(self, bins: int = 32, lead_shape=()):
        self.bins = int(bins)
        self.window = nuttall(np.arange(self.bins), float(self.bins - 1)) \
            .astype(np.float32)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        return jnp.zeros((*self.lead_shape, self.bins - 1), jnp.complex64)

    def __call__(self, state, x):
        n = x.shape[-1]
        b = self.bins
        buf = jnp.concatenate([state, x], axis=-1)  # [..., n + b - 1]
        # Sliding windows [..., n, b]
        idx = np.arange(n)[:, None] + np.arange(b)[None, :]
        windows = buf[..., jnp.asarray(idx)] * jnp.asarray(self.window)
        spec = jnp.fft.fft(windows, axis=-1)
        mags = jnp.abs(spec)
        k = jnp.argmax(mags, axis=-1)  # [..., n]
        xk = jnp.take_along_axis(spec, k[..., None], axis=-1)[..., 0]
        sign = jnp.where(k % 2 == 0, 1.0, -1.0)
        y = xk * sign.astype(xk.dtype)
        new_tail = buf[..., n:]
        return new_tail, y
