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


def _timed_serial(fn, state, x, iters: int) -> float:
    t0 = time.perf_counter()
    for _ in range(iters):
        state, c = fn(state, x)
    float(c)  # jit-output readback = true sync on axon
    return time.perf_counter() - t0


def _checksum(y):
    leaf = jax.tree_util.tree_leaves(y)[0]
    flat = leaf.reshape(-1)[:4]
    if jnp.iscomplexobj(flat):
        flat = flat.real
    return jnp.sum(flat.astype(jnp.float32))


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
    _timed_serial(step, state, x, 1)  # compile + first sync
    t1 = _timed_serial(step, state, x, 1)
    tn = _timed_serial(step, state, x, iters)
    per_iter = max((tn - t1) / (iters - 1), 1e-9)

    total = int(np.prod(shape))
    return {
        "block_len": n,
        "lead_shape": tuple(lead_shape),
        "time_per_block_us": per_iter * 1e6,
        "samples_per_sec": total / per_iter,
    }


def calibrate_sync(size: int = 2048, iters: int = 16) -> dict:
    """Serial matmul chain with known FLOPs; sanity-bounds the harness."""
    a = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((size, size)).astype(np.float32))

    @jax.jit
    def mm(state, x):
        y = state @ x
        return y, jnp.sum(y[0, :4])

    _timed_serial(mm, a, a, 1)
    t1 = _timed_serial(mm, a, a, 1)
    tn = _timed_serial(mm, a, a, iters)
    per_iter = max((tn - t1) / (iters - 1), 1e-9)
    tflops = 2 * size**3 / per_iter / 1e12
    # The failure mode this guards is sync-not-working (dispatch returns
    # before execution), which reads as absurdly HIGH TFLOP/s; a low
    # reading is just a slow/loaded backend, still a valid clock.
    return {"matmul_ms": per_iter * 1e3, "tflops": tflops,
            "plausible": 0.02 < tflops < 1000.0}


def report_table(results: dict[str, dict]) -> str:
    lines = [f"{'kernel':<28} {'block':>9} {'us/blk':>10} {'Msamp/s':>10}"]
    for name, r in results.items():
        lines.append(f"{name:<28} {r['block_len']:>9} "
                     f"{r['time_per_block_us']:>10.1f} "
                     f"{r['samples_per_sec'] / 1e6:>10.1f}")
    return "\n".join(lines)
