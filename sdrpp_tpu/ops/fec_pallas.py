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

__all__ = ["viterbi_acs_pallas", "viterbi_acs_pallas_batched",
           "viterbi_traceback_pallas_batched", "decode_soft_tpu"]


def _pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401
        # the axon tunnel registers the chip as backend "axon"
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _expansion_matrices(S: int) -> tuple[np.ndarray, np.ndarray]:
    """Butterfly predecessor selection as constant 0/1 matmuls:
    (m @ e0)[n] = m[n>>1], (m @ e1)[n] = m[(n>>1)+S/2]."""
    e0 = np.zeros((S, S), np.float32)
    e1 = np.zeros((S, S), np.float32)
    for n in range(S):
        e0[n >> 1, n] = 1.0
        e1[(n >> 1) + S // 2, n] = 1.0
    return e0, e1


def viterbi_acs_pallas_batched(soft: jax.Array, expected: jax.Array,
                               num_states: int,
                               interpret: bool = False) -> jax.Array:
    """Batched ACS: [B, T, R] soft bits -> [B, T, S] int8 decisions.

    B independent trellises advance in lock-step with the batch in VPU
    SUBLANES (metrics [B, S] rows): the per-step cost of the [B,S]x[S,S]
    predecessor matmuls and compare/selects is nearly independent of B up
    to a 32-sublane tile — the chunk-parallel (truncated) Viterbi's
    throughput engine (ConvCode.decode_soft_stream).

    Branch metrics precompute in XLA as [t, B, 2S] (perfect (32,128)
    tiles — computing them in-kernel from [.., R=2]-lane reads inflated
    VMEM 64x and crawled), and a GRID over 32-step time blocks keeps only
    one block VMEM-resident while the metrics scratch carries across the
    sequential grid."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, R = soft.shape
    S = num_states
    assert 2 * S <= 128, "register axis must fit one lane tile"
    pad_s = 128
    pad_b = -(-B // 32) * 32
    GT = 32  # trellis steps per grid block
    t_pad = -(-T // GT) * GT
    soft = jnp.pad(soft.astype(jnp.float32),
                   ((0, pad_b - B), (0, t_pad - T), (0, 0)))
    # bm[t, b, r] = sum_j |soft[b, t, j] - expected[r, j]|  -> [t, B, 2S]
    exp = jnp.asarray(expected[: 2 * S, :].astype(jnp.float32))
    bm = jnp.sum(jnp.abs(soft[:, :, None, :] - exp[None, None, :, :]),
                 axis=-1)  # [pad_b, t_pad, 2S]
    bm = jnp.swapaxes(bm, 0, 1)  # [t_pad, pad_b, 2S]
    if 2 * S < pad_s:
        bm = jnp.pad(bm, ((0, 0), (0, 0), (0, pad_s - 2 * S)))
    e0, e1 = _expansion_matrices(S)

    def kernel(bm_ref, e0_ref, e1_ref, dec_ref, metrics):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            lane = jax.lax.broadcasted_iota(jnp.int32, (pad_b, pad_s), 1)
            metrics[:] = jnp.where(lane == 0, 0.0, 1e9)

        for i in range(GT):
            bm_t = bm_ref[i]  # [pad_b, pad_s]; registers in [:, :2S]
            ms = metrics[:, :S]
            m0 = jnp.dot(ms, e0_ref[:], preferred_element_type=jnp.float32)
            m1 = jnp.dot(ms, e1_ref[:], preferred_element_type=jnp.float32)
            cand0 = m0 + bm_t[:, :S]
            cand1 = m1 + bm_t[:, S: 2 * S]
            take1 = cand1 < cand0
            new_m = jnp.where(take1, cand1, cand0)
            new_m = new_m - jnp.min(new_m, axis=1, keepdims=True)
            metrics[:] = jnp.concatenate(
                [new_m, jnp.full((pad_b, pad_s - S), 1e9, jnp.float32)],
                axis=1) if pad_s > S else new_m
            dec_ref[i] = jnp.concatenate(
                [take1.astype(jnp.int8),
                 jnp.zeros((pad_b, pad_s - S), jnp.int8)], axis=1) \
                if pad_s > S else take1.astype(jnp.int8)

    dec = jax.experimental.pallas.pallas_call(
        kernel,
        grid=(t_pad // GT,),
        out_shape=jax.ShapeDtypeStruct((t_pad, pad_b, pad_s), jnp.int8),
        in_specs=[
            pl.BlockSpec((GT, pad_b, pad_s), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GT, pad_b, pad_s), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((pad_b, pad_s), jnp.float32)],
        interpret=interpret,
    )(bm, jnp.asarray(e0), jnp.asarray(e1))
    return jnp.swapaxes(dec[:T, :B, :S], 0, 1)


def viterbi_traceback_pallas_batched(dec: jax.Array, num_states: int,
                                     interpret: bool = False) -> jax.Array:
    """Batched on-device traceback: [B, T, S] decisions -> [B, T] bits.

    The survivor walk is a pointer chase, but per-window dynamic lane
    indexing is hostile to the VPU — instead each window's state is a
    ONE-HOT lane vector: reading the decision is an elementwise multiply
    + lane reduction, and the predecessor step s -> (s>>1) [+S/2] is a
    constant 0/1 matmul (h0/h1). All B windows walk in lock-step in
    sublanes; the grid runs time blocks in REVERSE. The point: decisions
    never leave the device — only [T, B] bits do (the 8.8 MB decision
    readback over the tunnel cost 379 ms vs 5.4 ms of ACS compute).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, S = dec.shape
    pad_s = 128
    pad_b = -(-B // 32) * 32
    GT = 128  # bits land in the LANES of the [pad_b, t] output, so the
    #           per-block lane count must be a 128 tile
    t_pad = -(-T // GT) * GT
    # pad the TAIL with "took p0" decisions: walking back through pad
    # steps from state 0 stays at state 0 (0>>1 == 0), so starting the
    # walk at t_pad is identical to starting at T
    decp = jnp.pad(dec.astype(jnp.int8),
                   ((0, pad_b - B), (0, t_pad - T), (0, pad_s - S)))
    decp = jnp.swapaxes(decp, 0, 1)  # [t_pad, pad_b, pad_s]

    # the backward maps are exactly the forward expansions transposed:
    # (onehot @ e0.T)[p] = onehot[s] where p = s>>1
    h0, h1 = (m.T.copy() for m in _expansion_matrices(S))
    parity = np.zeros((1, pad_s), np.float32)
    parity[0, :S] = (np.arange(S) & 1).astype(np.float32)

    nblocks = t_pad // GT
    # column masks: colmask[i] selects lane i of a [pad_b, GT] bit tile
    # (a [B,1] sublane vector cannot reshape into a lane row on the VPU,
    # so the block's bits accumulate via broadcast-multiply-add instead)
    colmask = np.zeros((GT, 1, GT), np.float32)
    for i in range(GT):
        colmask[i, 0, i] = 1.0

    def kernel(dec_ref, h0_ref, h1_ref, par_ref, cm_ref, bits_ref, onehot):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            lane = jax.lax.broadcasted_iota(jnp.int32, (pad_b, pad_s), 1)
            onehot[:] = jnp.where(lane == 0, 1.0, 0.0)

        btile = jnp.zeros((pad_b, GT), jnp.float32)
        for i in range(GT - 1, -1, -1):
            oh = onehot[:]
            bit = jnp.sum(oh * par_ref[:], axis=1, keepdims=True)  # [B,1]
            took = jnp.sum(oh * dec_ref[i].astype(jnp.float32), axis=1,
                           keepdims=True)
            btile = btile + bit * cm_ref[i]
            ohs = oh[:, :S]
            oh0 = jnp.dot(ohs, h0_ref[:], preferred_element_type=jnp.float32)
            oh1 = jnp.dot(ohs, h1_ref[:], preferred_element_type=jnp.float32)
            nxt = (1.0 - took) * oh0 + took * oh1
            onehot[:] = jnp.concatenate(
                [nxt, jnp.zeros((pad_b, pad_s - S), jnp.float32)], axis=1) \
                if pad_s > S else nxt
        bits_ref[:] = btile.astype(jnp.int8)

    bits = jax.experimental.pallas.pallas_call(
        kernel,
        grid=(nblocks,),
        out_shape=jax.ShapeDtypeStruct((pad_b, t_pad), jnp.int8),
        in_specs=[
            pl.BlockSpec((GT, pad_b, pad_s),
                         lambda g: (nblocks - 1 - g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pad_s), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GT, 1, GT), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pad_b, GT), lambda g: (0, nblocks - 1 - g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((pad_b, pad_s), jnp.float32)],
        interpret=interpret,
    )(decp, jnp.asarray(h0), jnp.asarray(h1), jnp.asarray(parity),
      jnp.asarray(colmask))
    return bits[:B, :T].astype(jnp.uint8)


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
    e0, e1 = _expansion_matrices(S)

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
