"""Headline benchmark: aggregate IQ throughput through mix + FIR + demod.

BASELINE north star: Gsamples/s of IQ through the full
mix -> decimating-FIR cascade -> demodulate chain, scaled by the VFO-bank
channel axis (the reference's per-VFO thread chains become one batched
computation; SURVEY.md §2.15). This runs a 64-channel NFM scanner bank on a
wideband block and reports aggregate input-samples/s (channels x input
rate), the metric the "1 Gsample/s on a v5p-16 slice" target is defined
over (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the fraction of the 1 Gsample/s aggregate target this ONE
chip delivers (a v5p-16 slice has 8 chips; weak scaling is benchmarked
separately on the virtual mesh).
"""

import json
import sys
import time

import numpy as np


def main():
    use_cpu = "--cpu" in sys.argv
    import jax

    if use_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sdrpp_tpu.parallel.vfo_bank import VFOBank
    from sdrpp_tpu.ops.fm import Quadrature
    from sdrpp_tpu.ops.fir import FIR
    from sdrpp_tpu.ops import taps as taps_mod

    channels = 64
    fs_in = 6144000.0
    if_rate = 48000.0
    bandwidth = 12500.0

    offsets = np.linspace(-fs_in * 0.4, fs_in * 0.4, channels)
    vfo = VFOBank(offsets, fs_in, if_rate, bandwidth)
    demod = Quadrature(bandwidth / 2.0, if_rate, lead_shape=(channels,))
    audio_taps = taps_mod.low_pass(bandwidth / 2.0, bandwidth * 0.05, if_rate)
    audio_fir = FIR(audio_taps, dtype=jnp.float32, lead_shape=(channels,))

    n = 1 << 18  # input block (multiple of the 128x decimation)
    assert n % vfo.block_multiple == 0

    def step(state, x):
        vs, y = vfo(state[0], x)
        qs, y = demod(state[1], y)
        fs, y = audio_fir(state[2], y)
        return (vs, qs, fs), y

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    x = jnp.asarray(x)
    state = (vfo.init_state(), demod.init_state(), audio_fir.init_state())

    fn = jax.jit(step)
    state, y = fn(state, x)  # compile + warmup
    jax.block_until_ready(y)

    iters = 20
    best = float("inf")
    t0 = time.perf_counter()
    for _ in range(iters):
        t1 = time.perf_counter()
        state, y = fn(state, x)
        jax.block_until_ready(y)
        best = min(best, time.perf_counter() - t1)
    _total = time.perf_counter() - t0

    aggregate = channels * n / best  # input IQ samples/s through full chain
    target = 1e9  # BASELINE: 1 Gsample/s aggregate on a v5p-16 slice
    print(json.dumps({
        "metric": "aggregate_iq_mix_fir_demod_throughput",
        "value": aggregate,
        "unit": "samples/s/chip (64-ch NFM bank, input-samples x channels)",
        "vs_baseline": aggregate / target,
    }))


if __name__ == "__main__":
    main()
