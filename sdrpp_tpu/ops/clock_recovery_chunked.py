"""Chunk-parallel Mueller-Müller clock recovery (the stream-Viterbi trick
applied to the timing loop).

Reference semantics: core/src/dsp/clock_recovery/mm.h:100-156 — one
sequential loop whose input stride is data-dependent (offset +=
floor(phase)), ~9 Msym/s on a chip no matter how wide the VPU is. Here
the stream splits into K overlapping lanes that each re-acquire timing
over a W-sample warm-up window, batched on the VPU/MXU as ONE
vectorized lax.scan over symbol-steps. The two problems specific to a
TIMING loop, and their fixes:

1. **Per-lane dynamic sample addresses** (each lane interpolates at its
   own data-dependent offset — a gather, which lowers pathologically on
   TPU). Locked lanes all track the SAME transmitted symbol clock, so at
   symbol-step s their window starts differ by at most ~omega + jitter
   (their start phases are spread over one symbol, and omega_rel_limit
   caps drift): every lane's T-tap window fits inside one shared
   [R, K] tile whose start row is the across-lane minimum — a
   dynamic-START static-SIZE slice, with per-lane tap selection as
   one-hot masked sums and the 128-phase interpolation-bank row lookup
   as a one-hot [K,128] x [128,T] matmul (MXU food).

2. **Seam symbol accounting** (a symbol straddling a lane boundary could
   be emitted twice or dropped if neighboring lanes' timing estimates
   disagree by a hair). Lanes OVERLAP their emission ranges by
   ceil(omega) samples, so a boundary symbol is always emitted by at
   least one lane (usually both); every symbol carries its global
   position, the flattened set is sorted by position, and entries closer
   than omega/2 to their predecessor are deduplicated. A true symbol can
   be claimed by at most the two adjacent lanes, so adjacent-difference
   dedup is exact; locked-lane position disagreement (<< omega/2) cannot
   split a pair. Block seams need no dedup at all: lane 0 seeds from the
   carried exact symbol grid and emits from position 0.

Approximation contract (tests/test_clock_recovery_chunked.py): on a
timing-locked stream with W >> the loop's convergence time, the emitted
symbol sequence matches the sequential loop's (same count, same values
to interpolation tolerance); SDRPP_TPU_LOOPS=exact (or a short block)
falls back to the sequential kernel bit-identically.

Noise contract (tests/test_chunked_stress.py, measured bounds): with
AWGN at Eb/N0 = 5 dB (the top of the LRPT operating band; below ~4 dB
the EXACT loop itself leaves its envelope), windowed SER degradation vs
the exact loop is <= 1% absolute with <= 2 timing slips per 2^18
samples. A clock-rate error of 0.8% with omega_rel_limit = 1% pulls in
identically to the exact loop (same count, 100% matching decisions). A
squelched (all-zero) stretch covering several lane warm-up windows
produces no NaNs; post-gap lanes re-seed data-aided and the tail
re-locks to zero errors, though symbol COUNTS inside the gap region may
differ from the exact loop's free-run by a few.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .clock_recovery_pallas import MMClockRecoveryPallas
from .scans_pallas import _pallas_on_tpu

__all__ = ["MMClockRecoveryChunked", "mm_symbols_chunked"]

_UNROLL = 4  # symbols per scan step (share one window slice)


def _emit_lanes(x, hist, K, W, T):
    """[n] stream + [W+T-1] history -> [K, W + L + T - 1] overlapping
    lanes (payload L = ceil(n/K), replicate-padded) + (L, pad)."""
    n = x.shape[-1]
    L = -(-n // K)
    pad = K * L - n
    assert W <= L, (W, L)
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,))])
    ext = jnp.concatenate([hist, x])  # [W + T - 1 + K*L]
    # lane j = ext[j*L : j*L + W + L + T - 1]
    cols = W + L + T - 1
    idx = jnp.arange(K)[:, None] * L + jnp.arange(cols)[None, :]
    return ext[idx], L, pad


def mm_symbols_chunked(x, hist, offset0, phase0, freq0, err0, bank,
                       mu_gain, omega_gain, min_freq, max_freq,
                       lanes_k: int, warmup: int):
    """Run the M&M recurrence chunk-parallel over K lanes.

    ``x``: [n] complex64 (or float32) block. ``hist``: the previous
    block's last ``warmup + tap_count - 1`` raw samples. ``offset0`` /
    ``phase0`` / ``freq0`` / ``err0``: the carried loop state (err0 =
    (p1, p2, c1, c2) complex for complex MM, scalar ``last`` otherwise).
    Returns (syms, valid, positions, carry) with syms/valid/positions
    flattened [K * msc] in global position order, valid a prefix mask
    after dedup-compaction, and carry the lane-(K-1) final loop state
    mapped back to block coordinates.
    """
    cplx = jnp.iscomplexobj(x)
    P, T = bank.shape
    K, W = int(lanes_k), int(warmup)
    n = x.shape[-1]
    bank = jnp.asarray(bank, jnp.float32)

    lanes, L, _ = _emit_lanes(x, hist, K, W, T)
    cols = lanes.shape[-1]
    lre = lanes.real.astype(jnp.float32).T if cplx else \
        lanes.astype(jnp.float32).T                      # [cols, K]
    lim = lanes.imag.astype(jnp.float32).T if cplx else None

    omega = float((min_freq + max_freq) / 2.0)
    pad_e = int(np.ceil(omega))
    # U symbols per scan step share ONE window slice (the scan-step fixed
    # overheads — dynamic slice, min-reduce, bookkeeping — dominate the
    # masked-sum arithmetic, so amortize them)
    U = _UNROLL
    stride_max = int(np.ceil(max_freq))
    # shared-window height: one symbol of start spread + taps + margin,
    # plus the U-1 extra strides the unrolled symbols advance
    R = int(np.ceil(max_freq)) + T + 8 + (U - 1) * stride_max
    R = min(cols, -(-R // 8) * 8)

    # --- seeding: every lane must start ON the symbol grid ------------
    # The M&M loop SLEWS timing at only mu_gain*err (<= 0.01 samples per
    # symbol at the reference gains, mm.h:42-45) — it is a tracker, not
    # an acquirer, so a W-sample warm-up cannot pull in a half-symbol
    # seed error. Lanes therefore seed data-aided: the Oerder-Meyr
    # square-law estimator over each lane's warm-up window
    # (tau = -omega/2pi * arg sum_i |x_i|^2 e^{-2pi i j/omega}) lands
    # within ~0.1 symbol of true timing non-iteratively. Lane 0 instead
    # continues the CARRIED grid exactly (base class: buf = tail[T-1]+x,
    # next symbol at buf offset0 + phase0; ext = buf + W), so block
    # seams need no dedup.
    p0 = (offset0.astype(jnp.float32) + phase0) + np.float32(W)
    warm = lanes[:, :W]
    pw = (warm.real * warm.real + warm.imag * warm.imag) if cplx \
        else warm.astype(jnp.float32) ** 2
    rot = jnp.exp(np.complex64(-2j * np.pi)
                  * jnp.arange(W, dtype=jnp.float32) / freq0)
    c = jnp.sum(pw.astype(jnp.complex64) * rot, axis=-1)  # [K]
    t_hat = -jnp.arctan2(c.imag, c.real) * freq0 / np.float32(2 * np.pi)
    # symbol CENTER -> interpolation window START (bank group delay)
    pj_om = jnp.mod(t_hat - np.float32((T - 1) / 2.0), freq0)
    base = jnp.arange(K, dtype=jnp.float32) * np.float32(L)  # lane ext starts
    pj_grid = jnp.mod(p0 - base, freq0)
    pj = jnp.where(jnp.arange(K) == 0, pj_grid, pj_om)  # in [0, freq0)
    off_j = jnp.floor(pj).astype(jnp.int32)
    ph_j = (pj - jnp.floor(pj)).astype(jnp.float32)
    fr_j = jnp.broadcast_to(freq0.astype(jnp.float32), (K,))

    # error state seeds to zeros everywhere: p1/p2/c1/c2 are just the two
    # previous symbols and refresh within two warm-up steps, so threading
    # the carried err0 into a lane (whose start is mid-history, not at
    # the carried stream position) would be WRONG, not merely needless.
    del err0
    nerr = 8 if cplx else 1
    err_init = tuple(jnp.zeros((K,), jnp.float32) for _ in range(nerr))

    # lane-local emission window [emit_lo, W + L): buf index jL + o - W in
    # [0, n), lanes j > 0 reaching back pad_e extra samples so seam
    # symbols are always claimed by at least one locked lane
    emit_lo = jnp.where(jnp.arange(K) == 0, W, W - pad_e).astype(jnp.int32)
    emit_hi = np.int32(W + L)
    lane_goff = (jnp.arange(K, dtype=jnp.float32) * L
                 - np.float32(W))  # ext-local offset -> buf index

    mu = np.float32(mu_gain)
    og = np.float32(omega_gain)
    fmin = np.float32(min_freq)
    fmax = np.float32(max_freq)
    one = np.float32(1.0)
    iota_r = jnp.arange(R, dtype=jnp.int32)[:, None]       # [R, 1]
    iota_p = jnp.arange(P, dtype=jnp.int32)[None, :]       # [1, P]

    kvec = jnp.arange(T, dtype=jnp.int32)[:, None, None]   # [T, 1, 1]

    def step(carry, _):
        # one window slice serves U consecutive symbols (offsets advance
        # at most stride_max per symbol; R budgets for all U)
        r0 = jnp.clip(jnp.min(jnp.clip(carry[0], 0, cols - T)),
                      0, cols - R)
        win_re = jax.lax.dynamic_slice(lre, (r0, 0), (R, K))
        win_im = jax.lax.dynamic_slice(lim, (r0, 0), (R, K)) if cplx else None
        win = jnp.stack([win_re, win_im]) if cplx else win_re[None]

        outs = []
        for _u in range(U):
            offset, phase, freq = carry[0], carry[1], carry[2]
            err_state = carry[3:]
            active = offset < emit_hi
            o_eff = jnp.clip(offset, 0, cols - T)
            rel = o_eff - r0
            ok = (rel >= 0) & (rel <= R - T)
            rel = jnp.clip(rel, 0, R - T)

            ph_idx = jnp.clip(jnp.floor(phase * P).astype(jnp.int32),
                              0, P - 1)
            taps = jnp.matmul(
                (ph_idx[:, None] == iota_p).astype(jnp.float32), bank,
                precision=jax.lax.Precision.HIGHEST)       # [K, T]
            # [T, R, K] one-hot window masks -> [planes, T, K] tap inputs
            msk = (iota_r[None] == (rel[None, None, :] + kvec)
                   ).astype(jnp.float32)
            wsel = jnp.einsum("trk,prk->ptk", msk, win)
            o = jnp.einsum("ptk,kt->pk", wsel, taps)
            outr = o[0]
            outi = o[1] if cplx else None

            if cplx:
                p1r, p1i, p2r, p2i, c1r, c1i, c2r, c2i = err_state
                c0r = jnp.where(outr > 0, one, -one)
                c0i = jnp.where(outi > 0, one, -one)
                error = ((outr - p2r) * c1r + (outi - p2i) * c1i) \
                    - ((c0r - c2r) * p1r + (c0i - c2i) * p1i)
                new_err = (outr, outi, p1r, p1i, c0r, c0i, c1r, c1i)
            else:
                last = err_state[0]
                error = jnp.where(last > 0, one, -one) * outr \
                    - last * jnp.where(outr > 0, one, -one)
                new_err = (outr,)
            error = jnp.clip(error, -one, one)

            new_freq = jnp.clip(freq + og * error, fmin, fmax)
            new_phase = phase + new_freq + mu * error
            delta = jnp.floor(new_phase)
            new_offset = offset + delta.astype(jnp.int32)
            new_phase = new_phase - delta

            emit = active & ok & (offset >= emit_lo)
            pos = lane_goff + offset.astype(jnp.float32) + phase
            emit = emit & (pos < np.float32(n))
            sel = lambda a, b: jnp.where(active, a, b)  # noqa: E731
            outs.append((jnp.where(emit, outr, 0.0),
                         (jnp.where(emit, outi, 0.0) if cplx else None),
                         jnp.where(emit, pos, np.float32(np.inf)),
                         emit))
            carry = (sel(new_offset, offset), sel(new_phase, phase),
                     sel(new_freq, freq)) + tuple(
                         sel(a, b) for a, b in zip(new_err, err_state))
        out = tuple(None if vs[0] is None else jnp.stack(vs)
                    for vs in zip(*outs))
        return carry, out

    msc = int(np.ceil((L + W + T) / float(min_freq))) + 1
    msc = U * (-(-msc // U))
    carry0 = (off_j, ph_j, fr_j) + err_init
    carry_f, (sr, si, pos, emit) = jax.lax.scan(
        step, carry0, None, length=msc // U)

    # [msc, K] -> flatten, order by global position, dedup seam doubles
    pos = pos.reshape(-1)
    emit = emit.reshape(-1)
    syms = (jax.lax.complex(sr, si) if cplx else sr).reshape(-1)
    order = jnp.argsort(pos)                      # invalid slots -> +inf tail
    pos, emit, syms = pos[order], emit[order], syms[order]
    prev = jnp.concatenate([jnp.full((1,), -np.inf, pos.dtype), pos[:-1]])
    dup = (pos - prev) < np.float32(omega / 2.0)
    valid = emit & jnp.logical_not(dup)
    # compact to a prefix (the layout every consumer relies on)
    order2 = jnp.argsort(jnp.logical_not(valid), stable=True)
    syms, valid, pos = syms[order2], valid[order2], pos[order2]

    # carried loop state: lane K-1's final, mapped to next-block coords
    off_f = (carry_f[0][-1].astype(jnp.float32) + lane_goff[-1]
             - np.float32(n)).astype(jnp.int32)
    carry = {"offset": off_f, "phase": carry_f[1][-1], "freq": carry_f[2][-1]}
    if cplx:
        e = carry_f[3:]
        carry.update({
            "p1": jax.lax.complex(e[0][-1], e[1][-1]),
            "p2": jax.lax.complex(e[2][-1], e[3][-1]),
            "c1": jax.lax.complex(e[4][-1], e[5][-1]),
            "c2": jax.lax.complex(e[6][-1], e[7][-1])})
    else:
        carry["last"] = carry_f[3][-1]
    return syms, valid, pos, carry


class MMClockRecoveryChunked(MMClockRecoveryPallas):
    """MM clock recovery, chunk-parallel on TPU for long 1-D blocks
    (K overlapping warm-up lanes + position-dedup symbol merge), the
    scalar Pallas/scan kernel otherwise. State grows a ``hist`` buffer
    of the last ``warmup + tap_count - 1`` raw samples."""

    def __init__(self, *args, warmup: int = 512, max_lanes: int = 256,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.warmup = int(warmup)
        self.max_lanes = int(max_lanes)

    def _hist_len(self):
        return self.warmup + self.tap_count - 1

    def init_state(self):
        st = super().init_state()
        st["hist"] = jnp.zeros(self._hist_len(), self.dtype)
        return st

    def _lanes_for(self, n: int) -> int:
        from .scans_pallas import _chunk_lanes_for
        return _chunk_lanes_for(n, self.warmup, self.max_lanes)

    def max_symbols(self, n: int) -> int:
        k = self._lanes_for(n)
        if k >= 1 and (self.interpret or _pallas_on_tpu()):
            L = -(-n // k)
            W = self.warmup
            msc = int(np.ceil((L + W + self.tap_count)
                              / float(self.min_freq))) + 1
            return k * _UNROLL * (-(-msc // _UNROLL))
        return super().max_symbols(n)

    def __call__(self, state, x):
        k = self._lanes_for(x.shape[-1])
        if x.ndim != 1 or k < 1 or \
                not (self.interpret or _pallas_on_tpu()):
            sub = {kk: v for kk, v in state.items() if kk != "hist"}
            sub, out = super().__call__(sub, x)
            hist = jnp.concatenate(
                [state["hist"], x.astype(self.dtype)])[-self._hist_len():]
            return {**sub, "hist": hist}, out
        err0 = (state["p1"], state["p2"], state["c1"], state["c2"]) \
            if self.complex_input else state["last"]
        syms, valid, _, carry = mm_symbols_chunked(
            x.astype(self.dtype), state["hist"], state["offset"],
            state["phase"], state["freq"], err0, self.bank,
            self.mu_gain, self.omega_gain, self.min_freq, self.max_freq,
            lanes_k=k, warmup=self.warmup)
        hist = jnp.concatenate(
            [state["hist"], x.astype(self.dtype)])[-self._hist_len():]
        new_state = {"tail": jnp.concatenate(
            [state["tail"], x.astype(self.dtype)])[-(self.tap_count - 1):],
            "hist": hist, **carry}
        return new_state, (syms, valid)
