"""Windowed FFT power spectrum (the spectrum/waterfall front-end).

Reference pipeline (core/src/signal_path/iq_frontend.cpp:230-296): a
Reshaper keeps ``nz`` samples then skips the rest so FFTs fire at ``fft_rate``
Hz; each kept frame is multiplied by a unity-gain *centered* window
(core/src/dsp/window/window.h:38-64 — the alternating sign flip shifts DC to
the middle of the FFT output), zero-padded to ``fft_size``, FFT'd, and
converted to dB power: 10*log10(|X|^2 + 1e-20) (VOLK
volk_32fc_s32f_power_spectrum_32f with normalization 1.0).

Here a whole IQ block produces all of its FFT frames in ONE batched FFT —
[frames, fft_size] — which XLA tiles efficiently; no per-frame dispatch.

Also implements the waterfall max-decimation zoom (reference:
core/src/gui/widgets/fft_scaler.h:21-64, "doZoom") as a reduce over the
displayed bin ranges.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from .windows import Window, create_window

__all__ = ["gen_reshape_params", "SpectrumFFT", "fft_zoom"]


def gen_reshape_params(samplerate: float, size: int, rate: float) -> tuple[int, int]:
    """(skip, nz_count): FFTs fire every fs/rate samples with nz kept samples
    (reference: core/src/signal_path/iq_frontend.h:56-60)."""
    fft_interval = int(round(samplerate / rate))
    nz = min(fft_interval, size)
    skip = fft_interval - nz
    return skip, nz


class SpectrumFFT:
    """Batched spectrum pipeline for one wideband IQ block.

    Config: fft_size (up to 1M bins), nz (non-zero samples per frame), skip
    (samples dropped between frames), window kind. A block of
    ``frames*(nz+skip)`` samples yields ``frames`` dB spectra, centered
    (DC in the middle) via the window's sign-flip trick — no fftshift pass.
    """

    def __init__(self, fft_size: int, samplerate: float, fft_rate: float,
                 window: Window = Window.NUTTALL):
        self.fft_size = int(fft_size)
        self.samplerate = float(samplerate)
        self.fft_rate = float(fft_rate)
        self.window_kind = window
        skip, nz = gen_reshape_params(samplerate, fft_size, fft_rate)
        self.skip = skip
        self.nz = nz
        self.frame_len = nz + skip
        self.window = np.asarray(create_window(window, nz, centered=True))

    def frames_per_block(self, n: int) -> int:
        assert n % self.frame_len == 0, (n, self.frame_len)
        return n // self.frame_len

    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [..., n] complex64 -> [..., frames, fft_size] float32 dB."""
        n = x.shape[-1]
        frames = self.frames_per_block(n)
        fr = x.reshape(*x.shape[:-1], frames, self.frame_len)[..., : self.nz]
        w = jnp.asarray(self.window)
        windowed = fr * w.astype(jnp.complex64)
        if self.nz < self.fft_size:
            pad = [(0, 0)] * (windowed.ndim - 1) + [(0, self.fft_size - self.nz)]
            windowed = jnp.pad(windowed, pad)
        spec = jnp.fft.fft(windowed, axis=-1)
        power = spec.real * spec.real + spec.imag * spec.imag
        return (10.0 * jnp.log10(power + np.float32(1e-20))).astype(jnp.float32)


def fft_zoom(line_db: jax.Array, offset: int, width: int, out_width: int) -> jax.Array:
    """Max-decimation zoom of a raw FFT line into the display framebuffer
    (reference: core/src/gui/widgets/fft_scaler.h:21-64): each output pixel
    takes the max over its source bin span.

    Requires width % out_width == 0 for the fast reshape path; otherwise
    falls back to a gathered segment-max.
    """
    seg = jax.lax.dynamic_slice_in_dim(line_db, offset, width, axis=-1)
    if width % out_width == 0:
        factor = width // out_width
        return jnp.max(seg.reshape(*seg.shape[:-1], out_width, factor), axis=-1)
    # Uneven zoom: host-computed pixel assignment + segment max (one
    # vectorized op; the per-pixel Python loop would build an O(out_width)
    # graph for display-sized zooms).
    pixel = (np.arange(width, dtype=np.int64) * out_width // width).astype(np.int32)
    if seg.ndim == 1:
        return jax.ops.segment_max(seg, jnp.asarray(pixel),
                                   num_segments=out_width)
    flat = seg.reshape(-1, width)
    out = jax.vmap(lambda row: jax.ops.segment_max(
        row, jnp.asarray(pixel), num_segments=out_width))(flat)
    return out.reshape(*seg.shape[:-1], out_width)
