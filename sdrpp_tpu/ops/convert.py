"""Type/layout converters (reference: core/src/dsp/convert/*.h).

All trivially-parallel views: stereo audio is represented as [..., n, 2]
float32 (reference stereo_t is an interleaved {l, r} pair).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "complex_to_real",
    "complex_to_imag",
    "real_to_complex",
    "mono_to_stereo",
    "stereo_to_mono",
    "l_r_to_stereo",
    "complex_to_stereo",
]


def complex_to_real(x):
    """Take re (reference: convert/complex_to_real.h)."""
    return x.real


def complex_to_imag(x):
    return x.imag


def real_to_complex(x):
    """im := 0 (reference: convert/real_to_complex.h)."""
    return x.astype(jnp.complex64)


def mono_to_stereo(x):
    """Duplicate into L/R (reference: convert/mono_to_stereo.h)."""
    return jnp.stack([x, x], axis=-1)


def stereo_to_mono(x):
    """(l+r)/2 (reference: convert/stereo_to_mono.h)."""
    return (x[..., 0] + x[..., 1]) * 0.5


def l_r_to_stereo(l, r):
    """Interleave L/R (reference: convert/l_r_to_stereo.h)."""
    return jnp.stack([l, r], axis=-1)


def complex_to_stereo(x):
    """re->l, im->r (reference: convert/complex_to_stereo.h)."""
    return jnp.stack([x.real, x.imag], axis=-1)
