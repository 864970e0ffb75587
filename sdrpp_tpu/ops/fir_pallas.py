"""Pallas strided decimating-FIR: the wideband front-end's hot stage.

The /256 decimation cascade is the wideband headline chain's dominant
stage (PERFORMANCE.md r4/r5 stage budgets), and its cost is MEMORY
PASSES, not arithmetic: the XLA polyphase form evaluates tpp shifted
slice-FMAs over materialized intermediates (~3x tpp array passes), and
the lax.conv form materializes im2col patches (taps/stride x the input).
The r5 roofline sweep measured the honest HBM ceiling at ~680 GB/s and
the cascade at ~15x that floor.

OUTCOME (r5, measured on the chip): three variants of this kernel
(ROWS 1024/4096/8192, arbitrary/parallel grid semantics) all land at
2.0-2.1 Gsamp/s vs the XLA unrolled polyphase's 4.8-5.2 — the
[rows, r<=32] layout keeps 3/4 of the VPU lanes idle and the tpp
sublane-shifted slices force relayouts, so the hand kernel LOSES to
XLA's own fusion of the same decomposition. It stays in the tree as a
bit-correct (6e-8 on-chip) measured negative result, opt-in via
SDRPP_TPU_DECIM_PALLAS=1, for hardware where the balance differs.

The kernel computes the polyphase decomposition of the strided
correlation (reference: core/src/dsp/filter/decimating_fir.h:49-69)

    y[o] = sum_{t<tpp} sum_{p<r} taps[p + r*t] * buf[r*(o+t) + p]

entirely in VMEM: each grid step loads one [rows, r] reshaped input tile
(plus a tpp-1-row halo), accumulates the tpp shifted FMAs in registers,
lane-reduces, and stores [rows] outputs — ONE read of the input, one
write of the (r-fold smaller) output. The halo rows are materialized
outside the kernel by a single pad+reshape+slice (no overlapping
BlockSpecs needed).

Complex samples ride as split re/im planes in the same block (the taps
are real for every decim-plan stage), so one kernel invocation handles
both planes.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decimating_fir_pallas", "pallas_decim_supported"]

# outputs per grid step: [rows, r] f32 x 2 planes x ~3 live copies must
# stay under VMEM (~16 MB). Bigger is better: the tunnel-attached part
# charges a ~19 us FIXED cost per grid step (measured: 512 steps x
# 18.9 us dominated the first version), so the step count is what the
# tile size actually buys down.
ROWS = 4096


def pallas_decim_supported(n: int, ndim: int, r: int) -> bool:
    """The kernel handles single-stream blocks whose length tiles the
    [ROWS, r] grid; other shapes use the XLA forms."""
    return ndim == 1 and r >= 8 and n % (r * ROWS) == 0 and n // (r * ROWS) >= 1


def _kernel(tpp: int, xb_ref, halo_ref, taps_ref, out_ref):
    # xb: [1, 2, ROWS, r]  halo: [1, 2, H, r]  taps: [r, tpp]
    x = jnp.concatenate([xb_ref[0], halo_ref[0]], axis=1)  # [2, ROWS+H, r]
    acc = x[:, 0:ROWS, :] * taps_ref[:, 0][None, None, :]
    for t in range(1, tpp):  # static unroll (tpp <= 5 for plan stages)
        acc = acc + x[:, t:t + ROWS, :] * taps_ref[:, t][None, None, :]
    out_ref[0] = jnp.sum(acc, axis=-1)


@functools.partial(jax.jit, static_argnums=(3,))
def _run(planes, halo, taps2d, r):
    # planes: [G, 2, ROWS, r] f32; halo: [G, 2, H, r]; taps2d: [r, tpp]
    G = planes.shape[0]
    H = halo.shape[2]
    tpp = taps2d.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel, tpp),
        out_shape=jax.ShapeDtypeStruct((G, 2, ROWS), jnp.float32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 2, ROWS, r), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, H, r), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, tpp), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, ROWS), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=bool(os.environ.get("SDRPP_TPU_PALLAS_INTERPRET")),
    )(planes, halo, taps2d)


def decimating_fir_pallas(tail: jax.Array, x: jax.Array, taps: np.ndarray,
                          decimation: int):
    """Drop-in for decimating_fir_correlate on supported shapes: same
    (new_tail, y) contract, same phase semantics, complex or real x."""
    taps = np.asarray(taps, np.float64)
    m = taps.shape[0]
    r = int(decimation)
    n = x.shape[-1]
    assert pallas_decim_supported(n, x.ndim, r), (n, x.ndim, r)
    tpp = -(-m // r)
    H = tpp - 1 if tpp > 1 else 1  # halo rows (>=1 keeps shapes 4-D sane)
    G = n // (r * ROWS)

    buf = jnp.concatenate([tail, x], axis=-1)  # [n + m - 1]
    complex_in = jnp.iscomplexobj(x)
    if complex_in:
        flat = jnp.stack([buf.real, buf.imag]).astype(jnp.float32)
    else:
        flat = jnp.stack([buf, jnp.zeros_like(buf)]).astype(jnp.float32)
    # [2, n + m - 1] -> aligned blocks + halo via ONE pad+reshape+slice
    pad_to = (G + 1) * r * ROWS
    flat_p = jnp.pad(flat, ((0, 0), (0, pad_to - flat.shape[-1])))
    blocks = flat_p.reshape(2, G + 1, ROWS, r)
    planes = jnp.swapaxes(blocks[:, :G], 0, 1)        # [G, 2, ROWS, r]
    halo_rows = blocks[:, 1:, :H, :]                  # [2, G, H, r]
    halo = jnp.swapaxes(halo_rows, 0, 1)              # [G, 2, H, r]

    taps_pad = np.zeros(r * tpp, np.float64)
    taps_pad[:m] = taps
    taps2d = jnp.asarray(taps_pad.reshape(tpp, r).T.astype(np.float32))

    out = _run(planes, halo, taps2d, r)               # [G, 2, ROWS]
    y2 = jnp.swapaxes(out, 0, 1).reshape(2, G * ROWS)
    if complex_in:
        y = jax.lax.complex(y2[0], y2[1]).astype(jnp.complex64)
    else:
        y = y2[0].astype(x.dtype)
    new_tail = jax.lax.slice_in_dim(buf, n, n + m - 1, axis=-1)
    return new_tail, y
