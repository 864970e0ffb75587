"""Time-axis sharding: long-IQ blocks split across chips with halo exchange.

SURVEY §2.15/§5: the SDR analog of sequence/context parallelism. A block of
n samples is sharded over the mesh 'time' axis into P contiguous shards;
stateful ops need only tiny cross-shard communication:

- FIR/overlap-save: each shard needs the previous shard's last ntaps-1
  samples — a neighbor halo moved with ``jax.lax.ppermute`` over ICI
  (shard 0 receives the block-to-block carried tail instead).
- First-order linear recurrences (DC blocker, de-emphasis): each shard
  reduces its samples to one affine map (a^len, B); the P maps compose in
  a tiny all-gather'd exclusive scan, then every shard applies its prefix
  locally — O(P) scalars over ICI instead of serializing n samples.
- Pointwise ops with index-dependent terms (NCO mix): per-shard phase
  offsets are static (shard length x omega), baked in as a [P] table.

Everything runs under ``jax.shard_map`` over a Mesh(('time',)) axis; the
functions here are also correct for P=1 (no collectives inserted).
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.fir import _taps_spectrum

__all__ = [
    "sharded_fir", "sharded_affine_scan", "sharded_mix", "sharded_quadrature",
    "make_time_step_nfm",
]


def _right_halo(x_tail, axis: str):
    """Send each shard's tail to its RIGHT neighbor; shard 0 gets zeros."""
    p = jax.lax.axis_size(axis)
    if p == 1:
        return jnp.zeros_like(x_tail)
    perm = [(i, i + 1) for i in range(p - 1)]
    return jax.lax.ppermute(x_tail, axis, perm)


def _from_last_shard(val, axis: str):
    """Broadcast the LAST shard's value to every shard (psum of masked)."""
    p = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    masked = jnp.where(idx == p - 1, val, jnp.zeros_like(val))
    return jax.lax.psum(masked, axis)


def sharded_fir(tail, x_local, taps: np.ndarray, axis: str = "time"):
    """Overlap-save FIR over a time-sharded block.

    ``tail``: [m-1] carried global tail (same value on every shard —
    replicated). ``x_local``: this shard's samples. Returns
    (new_tail [m-1] replicated, y_local).
    """
    taps = np.asarray(taps)
    m = taps.shape[0]
    if m == 1:
        return tail, x_local * taps[0]
    my_tail = x_local[-(m - 1):]
    left = _right_halo(my_tail, axis)
    idx = jax.lax.axis_index(axis)
    left = jnp.where(idx == 0, tail.astype(left.dtype), left)
    buf = jnp.concatenate([left, x_local])
    n = x_local.shape[0]
    fft_len = 1 << (int(n + 2 * (m - 1)) - 1).bit_length()
    spec = jnp.asarray(_taps_spectrum(taps, fft_len))
    y_full = jnp.fft.ifft(jnp.fft.fft(buf.astype(jnp.complex64), n=fft_len) * spec)
    y = jax.lax.slice_in_dim(y_full, m - 1, m - 1 + n, axis=0)
    if not jnp.iscomplexobj(x_local) and not np.iscomplexobj(taps):
        y = y.real.astype(x_local.dtype)
    else:
        y = y.astype(jnp.complex64)
    new_tail = _from_last_shard(my_tail, axis)
    return new_tail, y


def sharded_affine_scan(a: float, b_local, y0, axis: str = "time"):
    """y[i] = a*y[i-1] + b[i] across the full time-sharded block.

    ``y0`` is the carried value entering the block (replicated). Each shard
    computes its local prefix, then receives the composed carry from all
    shards to its left (an exclusive max-P-element scan done with an
    all_gather of (A, B) pairs). Returns (final value replicated, y_local).
    """
    n = b_local.shape[0]
    a = jnp.asarray(a, jnp.result_type(b_local.dtype, jnp.float32))

    # Local prefix compositions (A, B) up to each i (inclusive), entering
    # carry assumed applied later: y[i] = A[i]*y_in + B[i].
    A_all, B_all = jax.lax.associative_scan(
        lambda lhs, rhs: (lhs[0] * rhs[0], rhs[0] * lhs[1] + rhs[1]),
        (jnp.full((n,), a, dtype=b_local.dtype), b_local))

    # Per-shard total composition = last element.
    shard_A = A_all[-1]
    shard_B = B_all[-1]
    p = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    gA = jax.lax.all_gather(shard_A, axis)  # [P]
    gB = jax.lax.all_gather(shard_B, axis)
    # Exclusive compose of shards < idx, applied to y0. The carry is
    # shard-varying (depends on idx), so cast the seed to varying first.
    y0v = jnp.asarray(y0, b_local.dtype) + jnp.zeros_like(A_all[0]) * 0
    y0v = jnp.where(idx >= 0, y0v, y0v)  # make shard-varying for scan typing

    def fold(carry, k):
        yv = jnp.where(k < idx, gA[k] * carry + gB[k], carry)
        return yv, None

    y_in, _ = jax.lax.scan(fold, y0v, jnp.arange(p))
    y_local = A_all * y_in + B_all
    y_final = _from_last_shard(y_local[-1], axis)
    return y_final, y_local


def sharded_mix(phase0, x_local, omega: float, shard_len: int, axis: str = "time"):
    """NCO mix of a time-sharded block with exact global phase.

    ``phase0``: carried phase entering the block (replicated). Per-shard
    start phases are phase0 + idx*shard_len*omega — idx-dependent but drawn
    from a host-precomputed [P] table of (shard_len*omega*k mod 2pi).
    """
    two_pi = 2.0 * np.pi
    idx = jax.lax.axis_index(axis)
    p = jax.lax.axis_size(axis)
    # Host-precomputed per-shard start offsets (k*shard_len*omega mod 2pi)
    # and the per-sample ramp; supports up to 64 shards.
    offs = jnp.asarray(
        np.mod(np.arange(65, dtype=np.float64) * shard_len * float(omega), two_pi)
        .astype(np.float32))
    ramp = jnp.asarray(
        np.mod(np.arange(shard_len, dtype=np.float64) * float(omega), two_pi)
        .astype(np.float32))
    ph = jnp.mod(phase0 + offs[idx] + ramp, np.float32(two_pi))
    y = x_local * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    # Global phase advance = p*shard_len*omega mod 2pi (same on all shards).
    new_phase = jnp.mod(phase0 + offs[p], np.float32(two_pi))
    return new_phase, y


def sharded_quadrature(last, x_local, inv_deviation: float, axis: str = "time"):
    """FM discriminator over a time-sharded block (1-sample halo)."""
    my_last = x_local[-1:]
    left = _right_halo(my_last, axis)
    idx = jax.lax.axis_index(axis)
    left = jnp.where(idx == 0, last, left)
    prev = jnp.concatenate([left, x_local[:-1]])
    prod = x_local * jnp.conj(prev)
    y = jnp.arctan2(prod.imag, prod.real) * np.float32(inv_deviation)
    new_last = _from_last_shard(my_last, axis)
    return new_last, y


def make_time_step_nfm(mesh: Mesh, offset_hz: float, samplerate: float,
                       bandwidth: float, block_size: int):
    """Build a jitted time-sharded NFM receive step over ``mesh``'s 'time'
    axis: mix -> channel low-pass FIR -> quadrature FM -> audio low-pass.

    Demonstrates the full halo/carry discipline; returns (step, init_state)
    with step(state, x[block]) -> (state, audio[block]).
    """
    from ..ops import taps as taps_mod
    from ..ops.mix import hz_to_rads

    p = mesh.shape["time"]
    assert block_size % p == 0
    shard_len = block_size // p
    omega = float(hz_to_rads(-offset_hz, samplerate))
    chan_taps = taps_mod.low_pass(bandwidth / 2.0, bandwidth * 0.05, samplerate)
    audio_taps = taps_mod.low_pass(bandwidth / 2.0, bandwidth * 0.1, samplerate)
    inv_dev = 1.0 / hz_to_rads(bandwidth / 2.0, samplerate)

    def step_sharded(state, x_local):
        phase, ctail, qlast, atail = state
        phase, y = sharded_mix(phase, x_local, omega, shard_len)
        ctail, y = sharded_fir(ctail, y, chan_taps)
        qlast, y = sharded_quadrature(qlast, y, inv_dev)
        atail, y = sharded_fir(atail, y, audio_taps)
        return (phase, ctail, qlast, atail), y

    from jax import shard_map

    smapped = shard_map(
        step_sharded, mesh=mesh,
        in_specs=((P(), P(), P(), P()), P("time")),
        out_specs=((P(), P(), P(), P()), P("time")),
    )
    step = jax.jit(smapped)

    def init_state():
        return (
            jnp.zeros((), jnp.float32),
            jnp.zeros(len(chan_taps) - 1, jnp.complex64),
            jnp.zeros(1, jnp.complex64),
            jnp.zeros(len(audio_taps) - 1, jnp.float32),
        )

    return step, init_state
