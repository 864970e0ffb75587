"""Pallas TPU kernel for Mueller-Müller clock recovery.

The lax.scan formulation in ops/clock_recovery.py performs, per symbol, a
dynamic_slice + an 8-tap vector dot — XLA lowers that to full vector ops
per SYMBOL, which measures ~0.1-1 Msymbol/s on the chip. Here the whole
recurrence runs as scalar SMEM arithmetic (like ops/scans_pallas.py):
input samples are staged to SMEM in chunks, the 128x8 interpolation bank
sits in SMEM (4 KB), and each symbol costs ~30 scalar ops.

Chunking: the consumed-input stride is data-dependent, so chunks mirror
the block-boundary semantics of the base class — a lax.scan threads
(offset, phase, freq, error-state) across [G, C]-shaped windows that
include the previous chunk's tail, exactly as the base class carries its
tail between blocks. Each chunk emits ceil(C/min_freq)+1 symbol slots
with a validity mask; a stable argsort compacts valid symbols to a
global prefix (the layout consumers rely on).

Bit-equivalence with MMClockRecovery is pinned by interpret-mode tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .clock_recovery import MMClockRecovery
from .scans_pallas import _pallas_on_tpu

__all__ = ["MMClockRecoveryPallas"]

_CHUNK = 4096  # input samples staged to SMEM per kernel call


def _mm_chunk_call(mm: "MMClockRecoveryPallas", c: int, msc: int,
                   interpret: bool):
    """Build the per-chunk pallas_call: processes a [c + taps - 1] window.

    State vectors: sti [1] i32 (offset), stf f32 ([phase, freq, last] for
    float MM; [phase, freq, p1r, p1i, p2r, p2i, c1r, c1i, c2r, c2i] for
    complex MM)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cplx = mm.complex_input
    P, T = mm.phase_count, mm.tap_count
    bank_flat = jnp.asarray(mm.bank.reshape(-1).astype(np.float32))
    mu, og = mm.mu_gain, mm.omega_gain
    fmin, fmax = mm.min_freq, mm.max_freq
    one = np.float32(1.0)

    def kernel(sti_ref, stf_ref, *refs):
        if cplx:
            bufr_ref, bufi_ref, bank_ref = refs[:3]
            outr_ref, outi_ref, val_ref, fin_i_ref, fin_f_ref = refs[3:]
        else:
            buf_ref, bank_ref = refs[:2]
            out_ref, val_ref, fin_i_ref, fin_f_ref = refs[2:]

        kf = 10 if cplx else 3

        def body(i, carry):
            offset = carry[0]
            phase, freq = carry[1], carry[2]
            active = offset < c

            ph_idx = jnp.clip(jnp.floor(phase * P).astype(jnp.int32),
                              0, P - 1)
            base = jnp.clip(offset, 0, c - 1)
            tb = ph_idx * T
            if cplx:
                outr = np.float32(0.0)
                outi = np.float32(0.0)
                for k in range(T):
                    w = bank_ref[tb + k]
                    outr = outr + bufr_ref[base + k] * w
                    outi = outi + bufi_ref[base + k] * w
                p1r, p1i, p2r, p2i = carry[3], carry[4], carry[5], carry[6]
                c1r, c1i, c2r, c2i = carry[7], carry[8], carry[9], carry[10]
                c0r = jnp.where(outr > 0, one, -one)
                c0i = jnp.where(outi > 0, one, -one)
                # ((out - p2) * conj(c1) - (c0 - c2) * conj(p1)).real
                ar, ai = outr - p2r, outi - p2i
                br, bi = c0r - c2r, c0i - c2i
                error = (ar * c1r + ai * c1i) - (br * p1r + bi * p1i)
            else:
                out = np.float32(0.0)
                for k in range(T):
                    out = out + buf_ref[base + k] * bank_ref[tb + k]
                last = carry[3]
                step_last = jnp.where(last > 0, one, -one)
                step_out = jnp.where(out > 0, one, -one)
                error = step_last * out - last * step_out
            error = jnp.clip(error, -one, one)

            new_freq = jnp.clip(freq + og * error, fmin, fmax)
            new_phase = phase + new_freq + mu * error
            delta = jnp.floor(new_phase)
            new_offset = offset + delta.astype(jnp.int32)
            new_phase = new_phase - delta

            sel = lambda a, b: jnp.where(active, a, b)  # noqa: E731
            if cplx:
                outr_ref[i] = jnp.where(active, outr, np.float32(0.0))
                outi_ref[i] = jnp.where(active, outi, np.float32(0.0))
                new_err = (sel(outr, p1r), sel(outi, p1i),
                           sel(p1r, p2r), sel(p1i, p2i),
                           sel(c0r, c1r), sel(c0i, c1i),
                           sel(c1r, c2r), sel(c1i, c2i))
            else:
                out_ref[i] = jnp.where(active, out, np.float32(0.0))
                new_err = (sel(out, last),)
            val_ref[i] = jnp.where(active, one, np.float32(0.0))
            return (sel(new_offset, offset), sel(new_phase, phase),
                    sel(new_freq, freq)) + new_err

        carry0 = (sti_ref[0],) + tuple(stf_ref[j] for j in range(kf))
        fin = jax.lax.fori_loop(0, msc, body, carry0)
        fin_i_ref[0] = fin[0] - c
        for j in range(kf):
            fin_f_ref[j] = fin[1 + j]

    kf = 10 if cplx else 3
    nbuf = 2 if cplx else 1
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    out_shapes = tuple([jax.ShapeDtypeStruct((msc,), jnp.float32)]
                       * (nbuf + 1)) + (
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((kf,), jnp.float32))
    call = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[smem() for _ in range(2 + nbuf + 1)],
        out_specs=tuple(smem() for _ in range(len(out_shapes))),
        interpret=interpret,
    )
    return call, bank_flat


class MMClockRecoveryPallas(MMClockRecovery):
    """MM clock recovery with the Pallas scalar kernel on TPU
    (lax.scan elsewhere). Output layout matches the base class: valid
    symbols form a prefix (compacted with a stable sort across chunks)."""

    def __init__(self, *args, interpret: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.interpret = interpret

    def max_symbols(self, n: int) -> int:
        if self._use_pallas_shape(n):
            c = min(_CHUNK, n)
            msc = int(np.ceil(c / float(self.min_freq))) + 1
            return (n // c) * msc
        return super().max_symbols(n)

    def _use_pallas_shape(self, n: int) -> bool:
        return n % min(_CHUNK, n) == 0

    def _use_pallas(self, x) -> bool:
        return (x.ndim == 1 and self._use_pallas_shape(x.shape[-1])
                and (self.interpret or _pallas_on_tpu()))

    def __call__(self, state, x):
        if not self._use_pallas(x):
            return super().__call__(state, x)
        n = x.shape[-1]
        t = self.tap_count
        c = min(_CHUNK, n)
        g = n // c
        msc = int(np.ceil(c / float(self.min_freq))) + 1
        cplx = self.complex_input

        call, bank_flat = _mm_chunk_call(self, c, msc, self.interpret)

        buf = jnp.concatenate([state["tail"], x])  # [n + t - 1]
        # [G, c + t - 1] windows: chunk plus the preceding tail samples
        idx = (jnp.arange(g)[:, None] * c + jnp.arange(c + t - 1)[None, :])
        wins = buf[idx]

        if cplx:
            stf0 = jnp.stack([
                state["phase"], state["freq"],
                state["p1"].real, state["p1"].imag,
                state["p2"].real, state["p2"].imag,
                state["c1"].real, state["c1"].imag,
                state["c2"].real, state["c2"].imag]).astype(jnp.float32)
        else:
            stf0 = jnp.stack([state["phase"], state["freq"],
                              state["last"]]).astype(jnp.float32)
        sti0 = state["offset"].reshape(1).astype(jnp.int32)

        def scan_body(carry, win):
            sti, stf = carry
            if cplx:
                outr, outi, val, sti, stf = call(
                    sti, stf, win.real.astype(jnp.float32),
                    win.imag.astype(jnp.float32), bank_flat)
                return (sti, stf), (outr, outi, val)
            out, val, sti, stf = call(
                sti, stf, win.astype(jnp.float32), bank_flat)
            return (sti, stf), (out, val)

        (sti_f, stf_f), outs = jax.lax.scan(scan_body, (sti0, stf0), wins)

        if cplx:
            outr, outi, val = outs
            syms = jax.lax.complex(outr.reshape(-1), outi.reshape(-1))
        else:
            out, val = outs
            syms = out.reshape(-1)
        val = val.reshape(-1) > 0.5

        # Compact valid symbols into a global prefix (stable keeps order).
        order = jnp.argsort(jnp.logical_not(val), stable=True)
        syms = syms[order]
        val = val[order]

        new_state = {
            "tail": buf[n:],
            "offset": sti_f[0],
            "phase": stf_f[0],
            "freq": stf_f[1],
        }
        if cplx:
            new_state.update({
                "p1": jax.lax.complex(stf_f[2], stf_f[3]),
                "p2": jax.lax.complex(stf_f[4], stf_f[5]),
                "c1": jax.lax.complex(stf_f[6], stf_f[7]),
                "c2": jax.lax.complex(stf_f[8], stf_f[9]),
            })
        else:
            new_state["last"] = stf_f[2]
        return new_state, (syms, val)
