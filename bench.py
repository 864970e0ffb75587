"""Headline benchmark: wideband IQ through a FULL receive chain, end-to-end.

Two configs, one chip, one JSON line:

1. WIDEBAND (the headline ``value``): a 1.572864 Gsps synthetic wideband
   block through the complete receive chain — power-of-2 decimation
   cascade (/256, the IQFrontEnd preprocessor role,
   core/src/signal_path/iq_frontend.cpp:230-249) -> 64-channel shared-FFT
   channelizer (the RxVFO bank, rx_vfo.h:102-114) -> per-channel Squelch
   (the radio IF-chain scan stage, radio_module.h:68-79) -> quadrature
   NFM demod -> per-channel audio FIR. ``value`` = INPUT-samples/s
   consumed by the whole chain: every input sample passes through every
   stage, so this is the unambiguous "aggregate IQ throughput through
   mix + FIR + demod" of the BASELINE north star (>= 1 Gsample/s on a
   v5p-16 slice) with no channels-x-rate arithmetic.

2. AGGREGATE + SSB (reported in ``unit``): the round-1 metric — the same
   64-channel NFM bank at 6.144 Msps, counting channels x input-rate
   (the per-VFO thread chains of the reference become one batched
   computation; SURVEY.md §2.15) — plus BASELINE config #4's actual mode
   family: a 64-channel SSB bank with Squelch + auto AGC in the path.

Calibration (VERDICT r2 #6): the known-FLOPs matmul calibration runs
right after the headline chain AND after the bank chains; both readings
land in the JSON (unit string + a ``calibration`` object), and a reading
below 50% of the known-healthy band (69-79 TFLOP/s) retries the whole
attempt — only the final attempt accepts a degraded tunnel, flagged
DEGRADED-TUNNEL in the unit.

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
    """The 64-channel NFM scanner bank (BASELINE config #4's chain,
    scan stages INSIDE the measured path: per-channel Squelch between
    the channelizer and the demod, the radio module's IF-chain position,
    decoder_modules/radio/src/radio_module.h:68-79)."""
    import jax.numpy as jnp

    from sdrpp_tpu.ops.channelizer import FFTChannelizerBank
    from sdrpp_tpu.ops.fm import Quadrature
    from sdrpp_tpu.ops.fir import FIR
    from sdrpp_tpu.ops.scans import Squelch
    from sdrpp_tpu.ops import taps as taps_mod

    offsets = np.linspace(-FS_MID * 0.4, FS_MID * 0.4, CHANNELS)
    # shared-FFT channelizer (SURVEY §2.5 TPU plan): one wideband FFT +
    # per-channel pruned frequency-domain mix/filter/decimate — verified
    # against the time-domain mix -> FIR -> decimate oracle to 5e-5
    # (tests/test_channelizer.py).
    vfo = FFTChannelizerBank(offsets, FS_MID, IF_RATE, bandwidth=BANDWIDTH)
    # level far below the noise floor: the squelch state machine runs its
    # full per-frame compute but stays OPEN, so the chain's demod work is
    # not skipped (a muted chain would be an inflation trap the other way)
    squelch = Squelch(-100.0, sub_blocks=1, lead_shape=(CHANNELS,))
    demod = Quadrature(BANDWIDTH / 2.0, IF_RATE, lead_shape=(CHANNELS,))
    audio_taps = taps_mod.low_pass(BANDWIDTH / 2.0, BANDWIDTH * 0.05, IF_RATE)
    audio_fir = FIR(audio_taps, dtype=jnp.float32, lead_shape=(CHANNELS,))
    return vfo, squelch, demod, audio_fir


def _make_ssb_bank():
    """BASELINE config #4's actual mode family: a 64-channel SSB bank —
    channelizer -> per-channel Squelch -> SSB product demod with the
    radio module's auto AGC (attack 50/fs, decay 5/fs; ssb.h:9-134)."""
    from sdrpp_tpu.ops.channelizer import FFTChannelizerBank
    from sdrpp_tpu.ops.scans import Squelch
    from sdrpp_tpu.models.analog import SSBDemod

    offsets = np.linspace(-FS_MID * 0.4, FS_MID * 0.4, CHANNELS)
    vfo = FFTChannelizerBank(offsets, FS_MID, IF_RATE, bandwidth=BANDWIDTH)
    squelch = Squelch(-100.0, sub_blocks=1, lead_shape=(CHANNELS,))
    demod = SSBDemod(mode="usb", bandwidth=2700.0, samplerate=IF_RATE,
                     lead_shape=(CHANNELS,))
    return vfo, squelch, demod


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
    """Input-samples/s of the FULL chain: /256 decim -> bank -> demod.

    SDRPP_TPU_PREDECIM selects the decimator formulation: "cascade"
    (time-domain plan cascade) or "fft" (the r5 FFTPowerDecimator — the
    /256 folded into one batched overlap-save FFT with spectral
    alias-fold; equivalence pinned by tests/test_fft_decimator.py).
    Default: cascade — the on-chip A/B (tools/bench_predecim.py,
    PERFORMANCE.md r5) measured the fold ~2x SLOWER (best 2.34 vs
    4.18 Gsamp/s standalone): XLA's FFT runs at ~40-70 GB/s effective
    on this part while the strided-conv cascade rides the MXU, so the
    VERDICT r4 #2 hypothesis is measured and rejected, not untested."""
    import os

    import jax
    import jax.numpy as jnp

    from sdrpp_tpu.ops.resample import FFTPowerDecimator, PowerDecimator

    mode = os.environ.get("SDRPP_TPU_PREDECIM", "cascade")
    vfo, squelch, demod, audio_fir = _make_bank()

    # ~2^24 wideband samples per chain block (2^22 on CPU to keep the
    # fallback path inside its deadline); K blocks inside ONE jit.
    if mode == "fft":
        pre = FFTPowerDecimator(PRE_DECIM, fft_len=1 << 20,
                                out_multiple=vfo.block_multiple)
        segs = 4 if use_cpu else 16  # ~2^22 / ~2^24 wideband samples
        n = segs * pre.block_multiple
        tile = 1 if use_cpu else 4  # n_base = segs/tile payloads
    else:
        pre = PowerDecimator(PRE_DECIM)
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
            ss, y = squelch(st[2], y)
            qs, y = demod(st[3], y)
            fs, y = audio_fir(st[4], y)
            c = jnp.sum(y.astype(jnp.float32))
            return ((ps, vs, ss, qs, fs), c * np.float32(1e-20)), c

        (state, _), cs = jax.lax.scan(body, (state, jnp.float32(0.0)),
                                      None, length=K)
        return state, jnp.sum(cs)

    make_state = jax.jit(lambda: (pre.init_state(), vfo.init_state(),
                                  squelch.init_state(), demod.init_state(),
                                  audio_fir.init_state()))
    per_step = _measure(step, make_state, base,
                        iters=8 if use_cpu else 16)
    return K * n / per_step


def _bench_aggregate(use_cpu: bool) -> float:
    """The round-1 metric: channels x input-rate through the bank."""
    import jax
    import jax.numpy as jnp

    vfo, squelch, demod, audio_fir = _make_bank()
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
            ss, y = squelch(st[1], y)
            qs, y = demod(st[2], y)
            fs, y = audio_fir(st[3], y)
            # full reduction: a partial slice would let XLA dead-code-
            # eliminate most of the chain
            return (vs, ss, qs, fs), jnp.sum(y.astype(jnp.float32))

        state, sums = jax.lax.scan(body, state, xk)
        return state, jnp.sum(sums)

    make_state = jax.jit(lambda: (vfo.init_state(), squelch.init_state(),
                                  demod.init_state(), audio_fir.init_state()))
    per_step = _measure(step, make_state, x, iters=16)
    return K * CHANNELS * n / per_step


def _bench_meteor(use_cpu: bool) -> float:
    """BASELINE config #5's front half: the full MeteorDemod chain
    (RRC matched filter -> FastAGC -> Costas QPSK -> chunk-parallel MM
    clock recovery) on a 2^20-sample 1-D block — input-samples/s.

    The checksum consumes EVERYTHING the real LRPT consumer consumes
    (symbols re/im AND the valid mask), each weighted by position:
    the MM reorders/compacts data, and a permutation-invariant sum
    would let XLA delete the merge (the r3 hidden-sort trap)."""
    import jax
    import jax.numpy as jnp

    from sdrpp_tpu.models.digital import MeteorDemod

    demod = MeteorDemod()  # 72 ksym QPSK at 150 kHz, meteor module params
    n = 1 << (18 if use_cpu else 20)
    K = 2 if use_cpu else 4

    # RRC-shaped QPSK base so the loops run in their locked regime (the
    # compute is data-independent, but lock keeps freq/offset dynamics in
    # the production envelope)
    rng = np.random.default_rng(2)
    sps = 150000.0 / 72000.0
    nsym = int(n / sps) + 4
    ph = np.pi / 4 + np.pi / 2 * rng.integers(0, 4, nsym)
    tsym = np.floor(np.arange(n) / sps).astype(int)
    iq = np.exp(1j * ph)[np.clip(tsym, 0, nsym - 1)]
    base = jnp.asarray(np.stack([iq.real, iq.imag]).astype(np.float32))

    msym = demod.max_symbols(n)
    iota = jnp.arange(msym, dtype=jnp.float32) * np.float32(1e-6)

    @jax.jit
    def step(state, xb):
        def body(carry, _):
            st, salt = carry
            x = jax.lax.complex(xb[0] + salt, xb[1])
            ds, (syms, valid) = demod(st, x)
            c = jnp.sum(syms.real * iota) + jnp.sum(syms.imag * iota) \
                + jnp.sum(valid.astype(jnp.float32) * iota)
            return (ds, c * np.float32(1e-20)), c

        (state, _), cs = jax.lax.scan(body, (state, jnp.float32(0.0)),
                                      None, length=K)
        return state, jnp.sum(cs)

    make_state = jax.jit(demod.init_state)
    per_step = _measure(step, make_state, base, iters=4 if use_cpu else 8)
    return K * n / per_step


def _bench_squelch_mute(use_cpu: bool):
    """The NFM bank with the squelch mute branch ENGAGED in the measured
    path (VERDICT r3 #6): half the channels carry a strong tone, half
    sit at the noise floor, threshold between — so the hysteresis /
    unmute-counter state machine actually mutes on-device. Returns
    (channels*input-rate samples/s, muted_ok) where muted_ok asserts the
    below-threshold channels produced all-zero audio."""
    import jax
    import jax.numpy as jnp

    from sdrpp_tpu.ops.channelizer import FFTChannelizerBank
    from sdrpp_tpu.ops.fm import Quadrature
    from sdrpp_tpu.ops.fir import FIR
    from sdrpp_tpu.ops.scans import Squelch
    from sdrpp_tpu.ops import taps as taps_mod

    offsets = np.linspace(-FS_MID * 0.4, FS_MID * 0.4, CHANNELS)
    vfo = FFTChannelizerBank(offsets, FS_MID, IF_RATE, bandwidth=BANDWIDTH)
    squelch = Squelch(-50.0, sub_blocks=1, lead_shape=(CHANNELS,))
    demod = Quadrature(BANDWIDTH / 2.0, IF_RATE, lead_shape=(CHANNELS,))
    audio_taps = taps_mod.low_pass(BANDWIDTH / 2.0, BANDWIDTH * 0.05,
                                   IF_RATE)
    audio_fir = FIR(audio_taps, dtype=jnp.float32, lead_shape=(CHANNELS,))

    n = 1 << (16 if use_cpu else 18)
    assert n % vfo.block_multiple == 0
    K = 4 if use_cpu else 8

    # even channels: strong FM carrier well above -50 dB; odd channels:
    # noise floor around -80 dB -> squelch must OPEN evens, MUTE odds
    rng = np.random.default_rng(3)
    t = np.arange(n) / FS_MID
    x = (1e-4 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)))
    for ch in range(0, CHANNELS, 2):
        fm = np.exp(1j * (2 * np.pi * offsets[ch] * t
                          + 0.5 * np.sin(2 * np.pi * 1000.0 * t)))
        x = x + 0.25 * fm
    x = np.stack([x.real, x.imag]).astype(np.float32)
    xk = jnp.asarray(np.broadcast_to(x, (K, 2, n)).copy())

    @jax.jit
    def step(state, xs):
        def body(st, xb):
            x = jax.lax.complex(xb[0], xb[1])
            vs, y = vfo(st[0], x)
            ss, y = squelch(st[1], y)
            qs, y = demod(st[2], y)
            fs, y = audio_fir(st[3], y)
            # per-channel |audio| sums: the mute assertion AND the
            # full-output checksum in one reduction
            per_ch = jnp.sum(jnp.abs(y.astype(jnp.float32)), axis=-1)
            return (vs, ss, qs, fs), per_ch

        state, per_ch = jax.lax.scan(body, state, xs)
        return state, jnp.sum(per_ch, axis=0)  # [CHANNELS]

    make_state = jax.jit(lambda: (vfo.init_state(), squelch.init_state(),
                                  demod.init_state(),
                                  audio_fir.init_state()))

    state = make_state()

    def run(k):
        t0 = time.perf_counter()
        st = state
        for _ in range(k):
            st, c = step(st, xk)
        c = np.asarray(c)  # sync via full [CHANNELS] f32 readback
        return time.perf_counter() - t0, c

    run(1)
    t1, per_ch = run(1)
    tn, _ = run(8 if use_cpu else 16)
    per_step = max((tn - t1) / ((8 if use_cpu else 16) - 1), 1e-9)
    # squelch state carries across warm-up blocks, so by now odd channels
    # are muted: their audio must be EXACTLY zero on-device
    muted_ok = bool(np.all(per_ch[1::2] == 0.0)
                    and np.all(per_ch[0::2] > 0.0))
    return K * CHANNELS * n / per_step, muted_ok


def _bench_ssb(use_cpu: bool) -> float:
    """BASELINE config #4's mode family: the 64-channel SSB bank with
    Squelch + auto AGC inside the measured path (channels x input-rate)."""
    import jax
    import jax.numpy as jnp

    vfo, squelch, demod = _make_ssb_bank()
    n = 1 << 18
    assert n % vfo.block_multiple == 0
    K = 8

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((K, 2, n)).astype(np.float32))

    @jax.jit
    def step(state, xk):
        def body(st, xs):
            x = jax.lax.complex(xs[0], xs[1])
            vs, y = vfo(st[0], x)
            ss, y = squelch(st[1], y)
            ds, y = demod(st[2], y)
            return (vs, ss, ds), jnp.sum(y.astype(jnp.float32))

        state, sums = jax.lax.scan(body, state, xk)
        return state, jnp.sum(sums)

    make_state = jax.jit(lambda: (vfo.init_state(), squelch.init_state(),
                                  demod.init_state()))
    per_step = _measure(step, make_state, x, iters=8 if use_cpu else 16)
    return K * CHANNELS * n / per_step


# known-healthy single-chip calibration band (PERFORMANCE.md r2: 69-79
# TFLOP/s true-f32 when the tunnel is healthy; BENCH_r02 was taken at a
# degraded 30.3). Below half the healthy floor the attempt is retried so
# headline numbers are not recorded on a degraded tunnel.
HEALTHY_TFLOPS = 69.0


class DegradedTunnel(RuntimeError):
    pass


def _attempt(use_cpu: bool, strict_cal: bool) -> dict:
    """One full benchmark attempt. Raises on backend failure; raises
    DegradedTunnel (when strict_cal) if calibration lands below 50% of
    the known-healthy band. Each chain number records the calibration
    taken right next to it (VERDICT r2 #6)."""
    from sdrpp_tpu.utils.speed_tester import calibrate_sync

    def cal_now():
        cal = calibrate_sync(size=1024 if use_cpu else 2048, iters=8)
        if not cal["plausible"]:
            raise RuntimeError(
                f"timing harness failed calibration "
                f"({cal['tflops']:.2e} TFLOP/s, {cal['matmul_ms']:.4f} ms)")
        if strict_cal and not use_cpu and \
                cal["tflops"] < 0.5 * HEALTHY_TFLOPS:
            raise DegradedTunnel(f"calibration {cal['tflops']:.1f} TFLOP/s "
                                 f"< 50% of healthy {HEALTHY_TFLOPS}")
        return cal

    wideband = _bench_wideband(use_cpu)
    cal_w = cal_now()  # calibration taken adjacent to the headline number
    aggregate = _bench_aggregate(use_cpu)
    ssb = _bench_ssb(use_cpu)
    cal_a = cal_now()
    meteor = _bench_meteor(use_cpu)
    mute_rate, muted_ok = _bench_squelch_mute(use_cpu)
    cal_m = cal_now()
    return {"wideband": wideband, "aggregate": aggregate, "ssb": ssb,
            "meteor": meteor, "mute_rate": mute_rate, "muted_ok": muted_ok,
            "cal": cal_w, "cal_after": cal_a, "cal_meteor": cal_m}


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
    attempts = 1 if use_cpu else 4
    for attempt in range(attempts):
        try:
            with _deadline(1200):
                # the LAST attempt accepts a degraded tunnel (a measured
                # under-estimate beats no number), earlier ones retry
                result = _attempt(use_cpu,
                                  strict_cal=attempt + 1 < attempts)
            break
        except TimeoutError:
            reason = "tpu benchmark timed out"
        except DegradedTunnel as e:
            reason = str(e)
        except Exception as e:
            reason = f"tpu benchmark failed: {type(e).__name__}"
        if attempt + 1 < attempts:
            time.sleep(60.0 * (attempt + 1))  # flaky-tunnel cool-down
    if result is None:
        _cpu_fallback(reason)
        return

    cal, cal_a = result["cal"], result["cal_after"]
    cal_m = result["cal_meteor"]
    degraded = "" if cal["tflops"] >= 0.5 * HEALTHY_TFLOPS or use_cpu \
        else " DEGRADED-TUNNEL"
    mute_note = "muted-channels-zeroed" if result["muted_ok"] \
        else "MUTE-ASSERT-FAILED"
    print(json.dumps({
        "metric": "wideband_e2e_iq_input_throughput",
        "value": result["wideband"],
        "unit": ("input-samples/s/chip through the FULL chain "
                 f"({FS_WIDE / 1e9:.2f} Gsps wideband -> /{PRE_DECIM} decim "
                 f"cascade -> {CHANNELS}-ch shared-FFT channelizer -> "
                 "per-ch Squelch -> NFM demod -> audio FIR; every input "
                 "sample traverses every stage; 64-ch NFM bank aggregate: "
                 f"{result['aggregate'] / 1e9:.2f} Gsamp/s; 64-ch SSB bank "
                 "(Squelch + auto AGC, BASELINE config #4 mode family): "
                 f"{result['ssb'] / 1e9:.2f} Gsamp/s; meteor LRPT chain "
                 "(RRC->AGC->Costas->MM, BASELINE config #5 front half): "
                 f"{result['meteor'] / 1e6:.1f} Msamp/s; 64-ch NFM bank w/ "
                 f"squelch mute ENGAGED on half the channels "
                 f"({mute_note}): {result['mute_rate'] / 1e9:.2f} Gsamp/s; "
                 "sync-calibrated "
                 f"{cal['tflops']:.1f}/{cal_a['tflops']:.1f}/"
                 f"{cal_m['tflops']:.1f} TFLOP/s true-f32 matmul "
                 f"after wideband/banks/meteor{degraded})"),
        "vs_baseline": result["wideband"] / 1e9,
        "calibration": {"tflops_after_wideband": cal["tflops"],
                        "tflops_after_banks": cal_a["tflops"],
                        "tflops_after_meteor": cal_m["tflops"],
                        "healthy_band_tflops": HEALTHY_TFLOPS,
                        "matmul_ms": cal["matmul_ms"]},
        "cal_watch": _cal_watch_summary(),
    }))


def _cal_watch_summary():
    """Round-long tunnel-health campaign summary (VERDICT r4 #5): the
    tools/cal_watch.py log, sampled every ~4 min in fresh subprocesses
    serialized against every TPU job via tools/tpu_lock.sh. Makes the
    per-healthy-TFLOP normalization auditable: either a healthy window
    appeared (and the bench rows were retaken inside it) or the log
    proves the band never opened this round."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "cal_watch_r5.jsonl")
    if not os.path.exists(path):
        return None
    vals, skipped, errors = [], 0, 0
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if "tflops" in rec:
                vals.append(rec["tflops"])
            elif "skipped" in rec:
                skipped += 1
            else:
                errors += 1
    if not vals:
        return {"samples": 0, "skipped_lock_busy": skipped,
                "errors": errors}
    import numpy as _np
    v = _np.asarray(vals)
    hist = {f"{lo}-{hi}": int(((v >= lo) & (v < hi)).sum())
            for lo, hi in ((0, 20), (20, 40), (40, 60), (60, 80),
                           (80, 200))}
    return {"samples": len(vals), "skipped_lock_busy": skipped,
            "errors": errors, "min": float(v.min()),
            "median": float(_np.median(v)), "max": float(v.max()),
            "histogram_tflops": hist,
            "healthy_samples_ge_50": int((v >= 50.0).sum())}


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # last-ditch: the driver must always get a JSON line
        _fail(f"unhandled {type(e).__name__}: {e}")
