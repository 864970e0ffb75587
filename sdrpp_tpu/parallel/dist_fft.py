"""Distributed (multi-chip) FFT: the tensor-parallel axis of SURVEY §2.15.

The reference has no model parallelism to mirror; its analog here is
sharding ONE giant FFT across chips when a single chip's HBM or FLOPs are
insufficient (SURVEY §2.15 "shard large FFTs (1M-bin) across chips:
transposed/4-step FFT with all-to-all over ICI").

Classic 4-step Cooley-Tukey over a device mesh axis ``fft``:
view x[n] (n = i*c + j) as a [r, c] matrix with the COLUMN axis j sharded.

1. length-r FFT down each column (local: every device holds full columns)
2. twiddle multiply by W_N^{j*k1} (local, global column index)
3. all-to-all transposition over ICI (split rows, concat columns)
4. length-c FFT along each row (local: every device now holds full rows)

The result C[k1, k2] = X[k1 + r*k2] comes back k1-sharded; ``natural``
order is the transpose-flatten. Everything is ordinary jnp under
``shard_map`` — XLA lowers step 3 to one all-to-all collective on ICI.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["dist_fft", "dist_power_spectrum"]


from functools import lru_cache


@lru_cache(maxsize=8)
def _twiddles(n: int, r: int, c: int) -> np.ndarray:
    """W_N^{j*k1} as [r, c] (k1 row, j column); cached — an eager caller
    must not pay an O(n) host exp + full upload per spectrum line."""
    return np.exp(-2j * np.pi
                  * (np.arange(r)[:, None] * np.arange(c)[None, :]) / n) \
        .astype(np.complex64)


def _splits(n: int, d: int) -> tuple[int, int]:
    """Pick r*c = n with d | r and d | c, r as close to sqrt(n) as fits."""
    r = 1 << (int(np.log2(n)) // 2)
    while r % d or (n // r) % d:
        r *= 2
        if r > n:
            raise ValueError(f"cannot split n={n} over {d} devices")
    return r, n // r


def dist_fft(x: jax.Array, mesh: Mesh, axis_name: str = "fft",
             natural: bool = True) -> jax.Array:
    """FFT of a length-n (power-of-2) complex array sharded over
    ``mesh[axis_name]``. ``natural=True`` returns X in natural index
    order ([n], k-sharded by GSPMD); ``natural=False`` returns the
    [r, c] matrix with X[k1 + r*k2] at (k1, k2), k1-sharded (cheaper —
    skips the final global transpose; fine for reductions like power
    spectra, which are order-free per bin only if the CONSUMER knows the
    mapping, so dB lines below use natural order).
    """
    n = x.shape[-1]
    d = mesh.shape[axis_name]
    r, c = _splits(n, d)
    tw = _twiddles(n, r, c)

    from jax import shard_map

    def step(xb, twb):
        # xb: [r, c/d] (j-sharded), twb: [r, c/d]
        a = jnp.fft.fft(xb, axis=0)          # 1. column FFTs (length r)
        b = a * twb                           # 2. twiddles
        b = jax.lax.all_to_all(b, axis_name, split_axis=0, concat_axis=1,
                               tiled=True)    # 3. transpose over ICI
        return jnp.fft.fft(b, axis=1)         # 4. row FFTs (length c)

    xm = x.reshape(r, c)
    cmat = shard_map(step, mesh=mesh,
                     in_specs=(P(None, axis_name), P(None, axis_name)),
                     out_specs=P(axis_name, None))(xm, jnp.asarray(tw))
    if not natural:
        return cmat
    # X[k1 + r*k2] = C[k1, k2] -> natural order = transpose-flatten;
    # GSPMD inserts the redistribution collective.
    return jnp.transpose(cmat).reshape(n)


def dist_power_spectrum(x: jax.Array, window: np.ndarray, mesh: Mesh,
                        axis_name: str = "fft") -> jax.Array:
    """Windowed centered dB power line for ONE giant FFT, distributed.

    Matches ops/spectrum.SpectrumFFT's math (unity-gain window with the
    centered sign-flip baked in, 10*log10(|X|^2), fftshift via the
    window's alternating signs) for sizes where one chip is insufficient.
    """
    n = x.shape[-1]
    w = jnp.asarray(np.asarray(window, np.float32))
    xw = (x * w).astype(jnp.complex64)
    X = dist_fft(xw, mesh, axis_name)
    p = X.real * X.real + X.imag * X.imag
    return 10.0 * jnp.log10(jnp.maximum(p, 1e-30)).astype(jnp.float32)


def shard_input(x, mesh: Mesh, axis_name: str = "fft"):
    """Place a host array as the [r, c] column-sharded layout dist_fft
    consumes (helper for benchmarks/ingest)."""
    n = x.shape[-1]
    r, c = _splits(n, mesh.shape[axis_name])
    return jax.device_put(
        x.reshape(r, c),
        NamedSharding(mesh, P(None, axis_name))).reshape(n)
