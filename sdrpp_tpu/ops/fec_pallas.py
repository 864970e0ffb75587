"""Pallas TPU kernel for the Viterbi add-compare-select recurrence.

The XLA lax.scan version (ops/fec.py) round-trips the [S]-state metric
vector through loop machinery every trellis step. This kernel keeps the
metrics resident in VMEM scratch for the whole block and streams decisions
out — one pallas_call per coded block (SURVEY §7 hard part #5: "Viterbi
throughput in pure XLA/Pallas").

Layout: states padded to the 128-lane width; the butterfly is gather-free
(see ops/fec.py decode_soft): predecessors of next-state n are n>>1 and
(n>>1)+S/2 (metric halves repeated x2), registers are n and n+S (branch
metric halves). Decisions are written as one int8 row per step; traceback
stays in the (cheap) XLA reverse scan.

Falls back transparently to the XLA path off-TPU.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from .fec import ConvCode

__all__ = ["viterbi_acs_pallas", "decode_soft_tpu"]


def _pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401
        # the axon tunnel registers the chip as backend "axon"
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def viterbi_acs_pallas(soft: jax.Array, expected: jax.Array, num_states: int,
                       interpret: bool = False) -> jax.Array:
    """Run the ACS over [T, R] soft bits -> [T, S] int8 decisions.

    ``expected``: [2S, R] expected soft levels per register (0/255).
    """
    from jax.experimental.pallas import tpu as pltpu

    T, R = soft.shape
    S = num_states
    LANES = 128
    pad_s = max(LANES, S)

    # Lane interleave m0[n] = m[n>>1] as a constant 0/1 matmul: Mosaic on
    # real hardware rejects the (1,S/2,2)->(1,S) shape-cast trick
    # ("infer-vector-layout: unsupported shape cast"), while a [1,S]x[S,S]
    # dot lowers cleanly onto the MXU.
    e0 = np.zeros((S, S), np.float32)
    e1 = np.zeros((S, S), np.float32)
    for n in range(S):
        e0[n >> 1, n] = 1.0                  # predecessor p0 = n>>1
        e1[(n >> 1) + S // 2, n] = 1.0       # predecessor p1 = p0 + S/2

    # Mosaic cannot store a single row at an arbitrary dynamic index (the
    # sublane index must be provably tile-aligned: "cannot statically
    # prove that index in dimension 0 is a multiple of 8"). The trellis
    # therefore runs in GROUPs of 32 steps (one int8 tile of sublanes):
    # an unrolled inner loop accumulates decision rows in a scratch tile,
    # then ONE aligned [32, pad_s] store per group.
    GROUP = 32
    from jax.experimental import pallas as pl

    t_pad = -(-T // GROUP) * GROUP
    if t_pad != T:
        soft = jnp.concatenate(
            [soft, jnp.zeros((t_pad - T, R), soft.dtype)], axis=0)

    def kernel(soft_ref, exp_ref, e0_ref, e1_ref, dec_ref, metrics, dtile):
        # init metrics: state 0 = 0, others large
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, pad_s), 1)
        metrics[:] = jnp.where(lane == 0, 0.0, 1e9)

        def group(g, _):
            base = g * GROUP
            # branch metrics for the whole group in one vector op:
            # bm32[i, r] = sum_j |soft[base+i, j] - expected[r, j]|
            sg = soft_ref[pl.ds(base, GROUP), :]  # [GROUP, R]
            bm32 = jnp.zeros((GROUP, 2 * S), jnp.float32)
            for j in range(R):
                bm32 = bm32 + jnp.abs(sg[:, j].reshape(GROUP, 1)
                                      - exp_ref[:, j].reshape(1, 2 * S))
            for i in range(GROUP):
                acc = bm32[i].reshape(1, 2 * S)
                m = metrics[:]  # [1, pad_s]; states live in [:, :S]
                ms = m[:, :S]
                m0 = jnp.dot(ms, e0_ref[:],
                             preferred_element_type=jnp.float32)
                m1 = jnp.dot(ms, e1_ref[:],
                             preferred_element_type=jnp.float32)
                cand0 = m0 + acc[:, :S]
                cand1 = m1 + acc[:, S: 2 * S]
                take1 = cand1 < cand0
                new_m = jnp.where(take1, cand1, cand0)
                new_m = new_m - jnp.min(new_m)
                metrics[:] = jnp.concatenate(
                    [new_m, jnp.full((1, pad_s - S), 1e9, jnp.float32)],
                    axis=1) if pad_s > S else new_m
                dec = jnp.concatenate(
                    [take1.astype(jnp.int8),
                     jnp.zeros((1, pad_s - S), jnp.int8)], axis=1) \
                    if pad_s > S else take1.astype(jnp.int8)
                dtile[i, :] = dec.reshape(pad_s)
            dec_ref[pl.ds(base, GROUP), :] = dtile[:]
            return 0

        jax.lax.fori_loop(0, t_pad // GROUP, group, 0)

    exp_padded = expected[: 2 * S, :].astype(jnp.float32)

    dec = jax.experimental.pallas.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, pad_s), jnp.int8),
        in_specs=[
            jax.experimental.pallas.BlockSpec(memory_space=pltpu.VMEM),
            jax.experimental.pallas.BlockSpec(memory_space=pltpu.VMEM),
            jax.experimental.pallas.BlockSpec(memory_space=pltpu.VMEM),
            jax.experimental.pallas.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=jax.experimental.pallas.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, pad_s), jnp.float32),
                        pltpu.VMEM((GROUP, pad_s), jnp.int8)],
        interpret=interpret,
    )(soft.astype(jnp.float32), exp_padded, jnp.asarray(e0),
      jnp.asarray(e1))
    return dec[:T, :S]


def decode_soft_tpu(code: ConvCode, soft_bits: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """ConvCode.decode_soft with the Pallas ACS (TPU) or XLA fallback."""
    if not interpret and not _pallas_available():
        return code.decode_soft(soft_bits)

    R, S = code.rate, code.num_states
    total = soft_bits.shape[0] // R
    soft = soft_bits.astype(jnp.float32).reshape(total, R)
    # Expected register outputs in the r0/r1 register order used by the
    # butterfly (r0 = n, r1 = n + S — which IS register index order).
    expected = jnp.asarray(code.reg_outputs.astype(np.float32) * 255.0)
    decisions = viterbi_acs_pallas(soft, expected, S, interpret=interpret)

    def back(state, dec_t):
        took1 = dec_t[state] != 0
        pred = jnp.where(took1, (state >> 1) + S // 2, state >> 1).astype(jnp.int32)
        bit = (state & 1).astype(jnp.uint8)
        return pred, bit

    _, bits_rev = jax.lax.scan(back, jnp.zeros((), jnp.int32), decisions,
                               reverse=True)
    return bits_rev[: total - (code.order + 1)]
