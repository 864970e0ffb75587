"""Headline benchmark: wideband IQ through a FULL receive chain, end-to-end.

Two configs, one chip, one JSON line:

1. WIDEBAND (the headline ``value``): a 1.572864 Gsps synthetic wideband
   block through the complete receive chain — power-of-2 decimation
   cascade (/256, the IQFrontEnd preprocessor role,
   core/src/signal_path/iq_frontend.cpp:230-249) -> 64-channel shared-FFT
   channelizer (the RxVFO bank, rx_vfo.h:102-114) -> quadrature NFM
   demod -> per-channel audio FIR. ``value`` = INPUT-samples/s consumed
   by the whole chain: every input sample passes through every stage, so
   this is the unambiguous "aggregate IQ throughput through
   mix + FIR + demod" of the BASELINE north star (>= 1 Gsample/s on a
   v5p-16 slice) with no channels-x-rate arithmetic.

2. AGGREGATE (reported in ``unit``): the round-1 metric — the same
   64-channel NFM bank at 6.144 Msps, counting channels x input-rate
   (the per-VFO thread chains of the reference become one batched
   computation; SURVEY.md §2.15).

Timing note: on the axon TPU tunnel, block_until_ready returns at dispatch;
real synchronization = reading back a jit output. The harness times N
serially-dependent steps, syncs once via a tiny f32 checksum output, and
subtracts the sync overhead with a 1-iteration run (see
sdrpp_tpu/utils/speed_tester.py). A known-FLOPs matmul calibration
(precision pinned to HIGHEST = true f32) guards against broken sync; if it
reports an implausible rate the benchmark aborts rather than print a bogus
number.

Anti-inflation: the checksum reduces over the ENTIRE audio output (a
partial slice lets XLA dead-code-eliminate the chain body), and each scan
iteration's input is salted with the carried checksum so stateless
sub-chains cannot be loop-hoisted. The wideband input is built in-graph by
tiling an uploaded random base block (the tunnel cannot upload the full
block cheaply; a tile + salt is a pure HBM copy that does not skip any
chain compute).

Resilience: the axon tunnel is intermittently flaky (spurious
UNIMPLEMENTED on execute/readback, multi-minute first-sync latency,
degradation after failed executions). The whole TPU attempt is retried
with backoff; on persistent failure the benchmark re-runs itself on CPU
in a subprocess so the driver ALWAYS gets a measured JSON line, with the
reason recorded in the unit string.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = fraction of the 1 Gsample/s target the wideband chain
delivers on ONE chip.
"""

import contextlib
import json
import signal
import sys
import time

import numpy as np

CHANNELS = 64
IF_RATE = 48000.0
BANDWIDTH = 12500.0
FS_MID = 6144000.0            # channelizer input rate (R = 128)
PRE_DECIM = 256               # wideband front decimation
FS_WIDE = FS_MID * PRE_DECIM  # 1.572864 Gsps


def _fail(reason: str):
    print(json.dumps({
        "metric": "wideband_e2e_iq_input_throughput",
        "value": 0.0,
        "unit": f"input-samples/s/chip ({reason})",
        "vs_baseline": 0.0,
    }))


@contextlib.contextmanager
def _deadline(seconds: int):
    def handler(signum, frame):
        raise TimeoutError()

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _make_bank():
    """The 64-channel NFM scanner bank (BASELINE config #4's chain)."""
    import jax.numpy as jnp

    from sdrpp_tpu.ops.channelizer import FFTChannelizerBank
    from sdrpp_tpu.ops.fm import Quadrature
    from sdrpp_tpu.ops.fir import FIR
    from sdrpp_tpu.ops import taps as taps_mod

    offsets = np.linspace(-FS_MID * 0.4, FS_MID * 0.4, CHANNELS)
    # shared-FFT channelizer (SURVEY §2.5 TPU plan): one wideband FFT +
    # per-channel pruned frequency-domain mix/filter/decimate — verified
    # against the time-domain mix -> FIR -> decimate oracle to 5e-5
    # (tests/test_channelizer.py).
    vfo = FFTChannelizerBank(offsets, FS_MID, IF_RATE, bandwidth=BANDWIDTH)
    demod = Quadrature(BANDWIDTH / 2.0, IF_RATE, lead_shape=(CHANNELS,))
    audio_taps = taps_mod.low_pass(BANDWIDTH / 2.0, BANDWIDTH * 0.05, IF_RATE)
    audio_fir = FIR(audio_taps, dtype=jnp.float32, lead_shape=(CHANNELS,))
    return vfo, demod, audio_fir


def _measure(step, make_state, x, iters: int) -> float:
    """Seconds per step: (T_N - T_1)/(N - 1) with a compile/warm run."""
    state = make_state()

    def run(k):
        t0 = time.perf_counter()
        st = state
        for _ in range(k):
            st, c = step(st, x)
        float(c)  # true sync (jit-output readback)
        return time.perf_counter() - t0

    run(1)  # compile + warm + prove the chain executes end-to-end
    t1 = run(1)
    tn = run(iters)
    return max((tn - t1) / (iters - 1), 1e-9)


def _bench_wideband(use_cpu: bool) -> float:
    """Input-samples/s of the FULL chain: /256 decim -> bank -> demod."""
    import jax
    import jax.numpy as jnp

    from sdrpp_tpu.ops.resample import PowerDecimator

    pre = PowerDecimator(PRE_DECIM)
    vfo, demod, audio_fir = _make_bank()

    # 2^24 wideband samples per chain block (2^22 on CPU to keep the
    # fallback path inside its deadline); K blocks inside ONE jit.
    n = 1 << (22 if use_cpu else 24)
    tile = 1 if use_cpu else 4
    n_base = n // tile
    assert (n // PRE_DECIM) % vfo.block_multiple == 0
    K = 4 if use_cpu else 8

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.standard_normal((2, n_base)).astype(np.float32))

    @jax.jit
    def step(state, xb):
        def body(carry, _):
            st, salt = carry
            # in-graph wideband block: tile the uploaded base (pure HBM
            # copy; chain compute untouched) + carried-checksum salt so
            # no iteration is loop-invariant
            x = jnp.tile(xb, (1, tile)) + salt
            x = jax.lax.complex(x[0], x[1])
            ps, x = pre(st[0], x)
            vs, y = vfo(st[1], x)
            qs, y = demod(st[2], y)
            fs, y = audio_fir(st[3], y)
            c = jnp.sum(y.astype(jnp.float32))
            return ((ps, vs, qs, fs), c * np.float32(1e-20)), c

        (state, _), cs = jax.lax.scan(body, (state, jnp.float32(0.0)),
                                      None, length=K)
        return state, jnp.sum(cs)

    make_state = jax.jit(lambda: (pre.init_state(), vfo.init_state(),
                                  demod.init_state(),
                                  audio_fir.init_state()))
    per_step = _measure(step, make_state, base,
                        iters=8 if use_cpu else 16)
    return K * n / per_step


def _bench_aggregate(use_cpu: bool) -> float:
    """The round-1 metric: channels x input-rate through the bank."""
    import jax
    import jax.numpy as jnp

    vfo, demod, audio_fir = _make_bank()
    n = 1 << 18
    assert n % vfo.block_multiple == 0
    K = 8

    rng = np.random.default_rng(0)
    # IQ crosses the host->device boundary as split float32: the axon
    # tunnel cannot transfer complex64 in either direction, while complex
    # math INSIDE a jit is fully supported.
    x = jnp.asarray(rng.standard_normal((K, 2, n)).astype(np.float32))

    @jax.jit
    def step(state, xk):
        def body(st, xs):
            x = jax.lax.complex(xs[0], xs[1])
            vs, y = vfo(st[0], x)
            qs, y = demod(st[1], y)
            fs, y = audio_fir(st[2], y)
            # full reduction: a partial slice would let XLA dead-code-
            # eliminate most of the chain
            return (vs, qs, fs), jnp.sum(y.astype(jnp.float32))

        state, sums = jax.lax.scan(body, state, xk)
        return state, jnp.sum(sums)

    make_state = jax.jit(lambda: (vfo.init_state(), demod.init_state(),
                                  audio_fir.init_state()))
    per_step = _measure(step, make_state, x, iters=16)
    return K * CHANNELS * n / per_step


def _attempt(use_cpu: bool) -> dict:
    """One full benchmark attempt. Raises on backend failure."""
    from sdrpp_tpu.utils.speed_tester import calibrate_sync

    wideband = _bench_wideband(use_cpu)
    # Only now calibrate the timing harness (known-FLOPs f32 matmul).
    cal = calibrate_sync(size=1024 if use_cpu else 2048, iters=8)
    if not cal["plausible"]:
        raise RuntimeError(
            f"timing harness failed calibration "
            f"({cal['tflops']:.2e} TFLOP/s, {cal['matmul_ms']:.4f} ms)")
    aggregate = _bench_aggregate(use_cpu)
    return {"wideband": wideband, "aggregate": aggregate, "cal": cal}


def main():
    import os

    # The fused bank chain measures fastest with the direct (lax.conv/MXU)
    # FIR path on TPU, while isolated long 1-D FIRs prefer fft — pin
    # direct here, leave the library default alone elsewhere.
    os.environ.setdefault("SDRPP_TPU_FIR", "direct")
    use_cpu = "--cpu" in sys.argv
    import jax

    if use_cpu:
        jax.config.update("jax_platforms", "cpu")

    def _cpu_fallback(reason):
        # The TPU tunnel is not executing work; rerun the whole benchmark
        # on CPU in a fresh process so the driver still gets a real
        # (if low) measured number, with the reason recorded in the unit.
        import subprocess
        if use_cpu:
            _fail(reason)
            return
        out = subprocess.run([sys.executable, __file__, "--cpu"],
                             capture_output=True, text=True, timeout=1200)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            d = json.loads(line)
            d["unit"] += f" [CPU FALLBACK: {reason}]"
            print(json.dumps(d))
        except Exception:
            _fail(f"{reason}; cpu fallback also failed")

    result = None
    reason = "tpu attempt failed"
    attempts = 1 if use_cpu else 3
    for attempt in range(attempts):
        try:
            with _deadline(1200):
                result = _attempt(use_cpu)
            break
        except TimeoutError:
            reason = "tpu benchmark timed out"
        except Exception as e:
            reason = f"tpu benchmark failed: {type(e).__name__}"
        if attempt + 1 < attempts:
            time.sleep(60.0 * (attempt + 1))  # flaky-tunnel cool-down
    if result is None:
        _cpu_fallback(reason)
        return

    cal = result["cal"]
    print(json.dumps({
        "metric": "wideband_e2e_iq_input_throughput",
        "value": result["wideband"],
        "unit": ("input-samples/s/chip through the FULL chain "
                 f"({FS_WIDE / 1e9:.2f} Gsps wideband -> /{PRE_DECIM} decim "
                 f"cascade -> {CHANNELS}-ch shared-FFT channelizer -> NFM "
                 "demod -> audio FIR; every input sample traverses every "
                 f"stage; 64-ch bank aggregate metric: "
                 f"{result['aggregate'] / 1e9:.2f} Gsamp/s; sync-calibrated "
                 f"{cal['tflops']:.1f} TFLOP/s true-f32 matmul)"),
        "vs_baseline": result["wideband"] / 1e9,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # last-ditch: the driver must always get a JSON line
        _fail(f"unhandled {type(e).__name__}: {e}")
