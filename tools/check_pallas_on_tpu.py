"""Probe every Pallas kernel on the CURRENT backend and report
COMPILED/FAILED — silent lax.scan fallbacks can mask real-hardware Mosaic
rejections (found: the Viterbi ACS never compiled on the chip while its
interpret-mode tests passed).

Usage: python tools/check_pallas_on_tpu.py
"""

import sys
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    n = 8192
    xs = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    checks = []

    def check(name, fn):
        try:
            out = fn()
            jax.block_until_ready(out)
            # force a true sync via readback of a small reduction
            float(np.asarray(out if out.ndim == 0 else out.ravel()[0]))
            checks.append((name, "COMPILED"))
        except Exception as e:
            checks.append((name, f"FAILED {type(e).__name__}: {str(e)[:120]}"))
            if "-v" in sys.argv:
                traceback.print_exc()

    from sdrpp_tpu.ops.scans_pallas import (agc_gains_pallas,
                                            costas_phases_pallas,
                                            fast_agc_gains_pallas,
                                            pll_phases_pallas)

    check("pll_phases_pallas (scalar SMEM)", lambda: jax.jit(
        lambda x: jnp.sum(pll_phases_pallas(
            jnp.arctan2(x[1], x[0]), 0.0, 0.0, 0.01, 0.001, -1.0, 1.0)[0]))(xs))
    check("pll lane-batched [8, n]", lambda: jax.jit(
        lambda x: jnp.sum(pll_phases_pallas(
            jnp.broadcast_to(jnp.arctan2(x[1], x[0]), (8, n)),
            jnp.zeros(8), jnp.zeros(8), 0.01, 0.001, -1.0, 1.0)[0]))(xs))
    check("fast_agc_gains_pallas", lambda: jax.jit(
        lambda x: jnp.sum(fast_agc_gains_pallas(
            jnp.abs(x[0]), 1.0, 1.0, 1e6, 0.01)[0]))(xs))
    check("agc_gains_pallas", lambda: jax.jit(
        lambda x: jnp.sum(agc_gains_pallas(
            jnp.abs(x[0]),
            jax.lax.cummax(jnp.abs(x[0]), reverse=True),
            1.0, 1.0, 1.0, 0.01, 0.001, 1e6, 1e6)[0]))(xs))
    check("costas_phases_pallas (order 2)", lambda: jax.jit(
        lambda x: jnp.sum(costas_phases_pallas(
            x[0], x[1], 0.0, 0.0, 2, 0.01, 0.001, -1.0, 1.0)[0]))(xs))
    check("costas meteor error fn", lambda: jax.jit(
        lambda x: jnp.sum(costas_phases_pallas(
            x[0], x[1], 0.0, 0.0, "meteor", 0.01, 0.001, -1.0, 1.0)[0]))(xs))

    from sdrpp_tpu.ops.clock_recovery_pallas import MMClockRecoveryPallas

    mm = MMClockRecoveryPallas(10.0, 0.001, 0.01, 0.01, complex_input=False)
    check("MM clock recovery pallas", lambda: jax.jit(
        lambda x: jnp.sum(mm(mm.init_state(), x[0])[1][0]))(xs))

    from sdrpp_tpu.ops.fec import ConvCode

    code = ConvCode(2, 7, (0o171, 0o133))
    soft = jnp.asarray(rng.uniform(0, 255, 4096).astype(np.float32))

    def _acs():
        from sdrpp_tpu.ops.fec_pallas import viterbi_acs_pallas
        expected = jnp.asarray(code.reg_outputs.astype(np.float32) * 255.0)
        return jax.jit(lambda s: jnp.sum(viterbi_acs_pallas(
            s.reshape(-1, 2), expected, 64).astype(jnp.float32)))(soft)

    check("viterbi_acs_pallas", _acs)

    def _acs_batched():
        from sdrpp_tpu.ops.fec_pallas import viterbi_acs_pallas_batched
        expected = jnp.asarray(code.reg_outputs.astype(np.float32) * 255.0)
        w = jnp.asarray(rng.uniform(0, 255, (8, 512, 2)).astype(np.float32))
        return jax.jit(lambda s: jnp.sum(viterbi_acs_pallas_batched(
            s, expected, 64).astype(jnp.float32)))(w)

    check("viterbi_acs_pallas_batched", _acs_batched)

    def _traceback_batched():
        from sdrpp_tpu.ops.fec_pallas import viterbi_traceback_pallas_batched
        d = jnp.asarray(rng.integers(0, 2, (8, 512, 64)).astype(np.int8))
        return jax.jit(lambda x: jnp.sum(viterbi_traceback_pallas_batched(
            x, 64).astype(jnp.float32)))(d)

    check("viterbi_traceback_pallas_batched", _traceback_batched)

    # chunk-parallel loop drivers (lane kernels under the warm-up-window
    # lane slicing; the default path of the analog demods on TPU)
    nn = 1 << 18
    xl = jnp.asarray(rng.uniform(-np.pi, np.pi, nn).astype(np.float32))
    hist = jnp.zeros(512, jnp.float32)

    def _pll_chunked():
        from sdrpp_tpu.ops.scans_pallas import pll_phases_chunked
        return jax.jit(lambda p: jnp.sum(pll_phases_chunked(
            p, hist, 0.1, 0.01, -1.0, 1.0, lanes_k=128)[0]))(xl)

    check("pll_phases_chunked", _pll_chunked)

    def _agc_chunked():
        from sdrpp_tpu.ops.scans_pallas import agc_gains_chunked
        a = jnp.abs(xl) + np.float32(0.1)
        return jax.jit(lambda p: jnp.sum(agc_gains_chunked(
            p, hist, 1.0, 0.1, 0.01, 1e4, 10.0, lanes_k=128)[0]))(a)

    check("agc_gains_chunked", _agc_chunked)

    def _fast_agc_chunked():
        from sdrpp_tpu.ops.scans_pallas import fast_agc_gains_chunked
        a = jnp.abs(xl) + np.float32(0.1)
        return jax.jit(lambda p: jnp.sum(fast_agc_gains_chunked(
            p, hist, 1.0, 1e4, 0.01, lanes_k=128)[0]))(a)

    check("fast_agc_gains_chunked", _fast_agc_chunked)

    def _costas_chunked():
        from sdrpp_tpu.ops.scans_pallas import costas_phases_chunked
        re = jnp.cos(xl)
        im = jnp.sin(xl)
        h = jnp.zeros(512, jnp.float32)
        return jax.jit(lambda a, b: jnp.sum(costas_phases_chunked(
            a, b, h + 1.0, h, 0.0, 0.0, 4, 0.03, 0.001, -1.0, 1.0,
            lanes_k=128)[0]))(re, im)

    check("costas_phases_chunked", _costas_chunked)

    def _costas_chunked_meteor():
        from sdrpp_tpu.ops.scans_pallas import (costas_phases_chunked,
                                                costas_streams)
        s1, s2 = costas_streams(jnp.cos(xl), jnp.sin(xl), "meteor")
        h = jnp.zeros(512, jnp.float32)
        return jax.jit(lambda a, b: jnp.sum(costas_phases_chunked(
            a, b, h, h + 1.0, 0.0, 0.0, "meteor", 0.014, 0.0001, -1.0,
            1.0, lanes_k=128)[0]))(s1, s2)

    check("costas_phases_chunked_meteor", _costas_chunked_meteor)

    def _mm_chunked():
        from sdrpp_tpu.ops.clock_recovery_chunked import mm_symbols_chunked

        # complex views are formed IN-GRAPH: the axon tunnel cannot
        # device_put complex64 (UNIMPLEMENTED), floats transfer fine
        def f(x):
            sig = jax.lax.complex(jnp.cos(x), jnp.sin(x))
            hist = jnp.zeros(512 + mm.tap_count - 1, jnp.complex64)
            return jnp.sum(mm_symbols_chunked(
                sig, hist, jnp.zeros((), jnp.int32), jnp.float32(0.0),
                jnp.float32(150000.0 / 72000.0), None, mm.bank,
                0.01, 0.001,
                np.float32(150000.0 / 72000.0 * 0.99),
                np.float32(150000.0 / 72000.0 * 1.01),
                lanes_k=128, warmup=512)[0].real)

        return jax.jit(f)(xl)

    check("mm_symbols_chunked", _mm_chunked)

    width = max(len(n) for n, _ in checks)
    failed = 0
    for name, status in checks:
        print(f"{name:<{width}}  {status}")
        failed += status != "COMPILED"
    print(f"{len(checks) - failed}/{len(checks)} kernels compiled on "
          f"{jax.default_backend()}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
