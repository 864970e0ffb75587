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
        return jax.default_backend() in ("tpu",)
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

    def kernel(soft_ref, exp_ref, dec_ref, metrics):
        # init metrics: state 0 = 0, others large
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, pad_s), 1)
        metrics[:] = jnp.where(lane == 0, 0.0, 1e9)

        def body(t, _):
            s_t = soft_ref[t, :]  # [R]
            # branch metrics for all 2S registers (register index order)
            acc = jnp.zeros((1, 2 * S), jnp.float32)
            for j in range(R):
                acc = acc + jnp.abs(s_t[j] - exp_ref[:, j].reshape(1, -1))
            m = metrics[:]  # [1, pad_s]; states live in [:, :S]

            def rep2(v):  # element-wise repeat x2 along lanes: [1,S/2]->[1,S]
                return jnp.broadcast_to(v.reshape(1, S // 2, 1),
                                        (1, S // 2, 2)).reshape(1, S)

            m0 = rep2(m[:, : S // 2])     # metrics[n>>1]
            m1 = rep2(m[:, S // 2: S])    # metrics[(n>>1)+S/2]
            cand0 = m0 + acc[:, :S]
            cand1 = m1 + acc[:, S: 2 * S]
            take1 = cand1 < cand0
            new_m = jnp.where(take1, cand1, cand0)
            new_m = new_m - jnp.min(new_m)
            metrics[:] = jnp.concatenate(
                [new_m, jnp.full((1, pad_s - S), 1e9, jnp.float32)], axis=1) \
                if pad_s > S else new_m
            dec = jnp.concatenate(
                [take1.astype(jnp.int8),
                 jnp.zeros((1, pad_s - S), jnp.int8)], axis=1) \
                if pad_s > S else take1.astype(jnp.int8)
            dec_ref[t, :] = dec.reshape(pad_s)
            return 0

        jax.lax.fori_loop(0, T, body, 0)

    exp_padded = expected[: 2 * S, :].astype(jnp.float32)

    dec = jax.experimental.pallas.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, pad_s), jnp.int8),
        in_specs=[
            jax.experimental.pallas.BlockSpec(memory_space=pltpu.VMEM),
            jax.experimental.pallas.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=jax.experimental.pallas.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, pad_s), jnp.float32)],
        interpret=interpret,
    )(soft.astype(jnp.float32), exp_padded)
    return dec[:, :S]


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
