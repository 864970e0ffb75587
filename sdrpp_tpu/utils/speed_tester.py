"""Per-kernel throughput benchmark harness.

Reference: core/src/dsp/bench/speed_tester.h:31-56 — saturate one block
with random samples and report samples/s.

Timing on the axon TPU tunnel needs care: ``block_until_ready`` returns at
dispatch (it does NOT wait for remote execution) and eager-op dispatch is
unreliable — but READING BACK A JIT OUTPUT is a true synchronization
point. So the harness:

1. builds everything (inputs via host->device transfer, state under jit),
2. runs N serially-dependent iterations of the jitted step whose outputs
   include a tiny float32 checksum,
3. syncs by fetching the final checksum (forces the whole chain), and
4. subtracts the one-off sync/dispatch overhead with a 1-iteration run:
   per_iter = (T_N - T_1) / (N - 1).

``calibrate_sync()`` cross-checks the method against a known-FLOPs matmul
and should be reported next to any numbers.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["speed_test", "report_table", "calibrate_sync"]


def _make_chain(fn):
    """Wrap a step fn as a single-launch N-iteration serial chain.

    The axon tunnel adds 5-30 ms of launch latency per executable, which
    would dominate a Python-loop measurement; a lax.scan over the step
    keeps the whole chain in one launch. Returns chain(state, x, n)
    (n static). The checksum sum read-back is the only true sync on axon.
    """
    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def chain(state, x, n):
        # A tiny checksum-derived salt makes each iteration's input
        # distinct — otherwise a STATELESS block's scan body is loop-
        # invariant and XLA hoists it to a single evaluation.
        def body(carry, _):
            st, salt = carry
            st, c = fn(st, x + salt.astype(x.dtype))
            return (st, c * np.float32(1e-20)), c
        (st, _), cs = jax.lax.scan(
            body, (state, jnp.float32(0.0)), None, length=n)
        return st, jnp.sum(cs)

    return chain


def _timed(chain, state, x, iters: int, warm: set) -> float:
    if iters not in warm:
        float(chain(state, x, iters)[1])  # compile outside the timing
        warm.add(iters)
    t0 = time.perf_counter()
    _, c = chain(state, x, iters)
    float(c)
    return time.perf_counter() - t0


def _checksum(y):
    """Full reduction over the output — a cheap-looking slice would let
    XLA dead-code-eliminate the actual kernel work."""
    leaf = jax.tree_util.tree_leaves(y)[0]
    if jnp.iscomplexobj(leaf):
        leaf = leaf.real
    return jnp.sum(leaf.astype(jnp.float32))


def speed_test(block, n: int, dtype=jnp.complex64, iters: int = 16,
               lead_shape=(), seed: int = 0) -> dict:
    """Measure a Block's throughput at block length n (input samples/s
    counting all leading axes)."""
    rng = np.random.default_rng(seed)
    shape = (*lead_shape, n)
    # Complex inputs cross the host->device boundary as split float32
    # (the axon tunnel cannot device_put complex64; complex math inside
    # jit is fine) and the complex view is formed in-graph.
    is_complex = jnp.issubdtype(dtype, jnp.complexfloating)
    x = jnp.asarray(rng.standard_normal((2, *shape) if is_complex else shape)
                    .astype(np.float32))

    @jax.jit
    def step(state, x):
        if is_complex:
            x = jax.lax.complex(x[0], x[1])
        state, y = block(state, x)
        return state, _checksum(y)

    state = jax.jit(lambda d: block.init_state())(np.float32(0))
    chain = _make_chain(step)
    warm: set = set()
    t1 = _timed(chain, state, x, 1, warm)
    # Grow the iteration count until the serial chain is comfortably above
    # the sync/dispatch overhead (tn - t1), or fast kernels read as 0 us.
    while True:
        tn = _timed(chain, state, x, iters, warm)
        if tn - t1 > 0.05 or iters >= 1024:
            break
        iters *= 4
    per_iter = max((tn - t1) / (iters - 1), 1e-9)

    total = int(np.prod(shape))
    return {
        "block_len": n,
        "lead_shape": tuple(lead_shape),
        "time_per_block_us": per_iter * 1e6,
        "samples_per_sec": total / per_iter,
    }


def calibrate_sync(size: int = 2048, iters: int = 16) -> dict:
    """Serial matmul chain with known FLOPs; sanity-bounds the harness.

    The iteration count GROWS until the chain's incremental time clears
    the tunnel's launch-latency noise (5-30 ms per run): with a fixed
    small count, (tn - t1) measures noise and the TFLOP/s reading swings
    by orders of magnitude between runs (observed 1.7 to 421 on the same
    chip with 16 x ~0.1 ms matmuls).
    """
    a = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((size, size)).astype(np.float32))

    @jax.jit
    def mm(state, x):
        # Precision is PINNED: XLA's DEFAULT f32 matmul on TPU lowers to
        # bf16 MXU passes, which reads ~2.5x the true-f32 rate and made
        # round-1 reports disagree (184 vs 69-79 TFLOP/s for the same
        # probe). HIGHEST = full f32 accumulation, so the FLOP count in
        # the TFLOP/s formula matches what the chip actually executes.
        y = jnp.matmul(state, x, precision=jax.lax.Precision.HIGHEST)
        # full-reduction checksum: the carried state already forces every
        # matmul, the sum keeps the per-iteration output alive too
        return y, jnp.sum(y)

    chain = _make_chain(mm)
    warm: set = set()
    t1 = _timed(chain, a, a, 1, warm)
    while True:
        tn = _timed(chain, a, a, iters, warm)
        if tn - t1 > 0.25 or iters >= 4096:
            break
        iters *= 4
    per_iter = max((tn - t1) / (iters - 1), 1e-9)
    tflops = 2 * size**3 / per_iter / 1e12
    # The failure mode this guards is sync-not-working (dispatch returns
    # before execution), which reads as absurdly HIGH TFLOP/s; a low
    # reading is just a slow/loaded backend, still a valid clock. With
    # precision pinned to HIGHEST (true f32: 3-6 bf16 passes on the MXU),
    # no current single TPU chip exceeds ~155 TFLOP/s f32 (v5p bf16 peak
    # 459 / 3 passes); 200 leaves headroom without hiding a 2.5x
    # precision-induced inflation like the round-1 184-vs-73 discrepancy.
    return {"matmul_ms": per_iter * 1e3, "tflops": tflops, "iters": iters,
            "plausible": 0.02 < tflops < 200.0}


def report_table(results: dict[str, dict]) -> str:
    lines = [f"{'kernel':<28} {'block':>9} {'us/blk':>10} {'Msamp/s':>10}"]
    for name, r in results.items():
        lines.append(f"{name:<28} {r['block_len']:>9} "
                     f"{r['time_per_block_us']:>10.1f} "
                     f"{r['samples_per_sec'] / 1e6:>10.1f}")
    return "\n".join(lines)
