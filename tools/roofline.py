"""Speed-of-light fractions for the flagship kernels (BASELINE north
star row 5: "roofline per chip").

For each flagship kernel (1M-point spectrum FFT, 255-tap overlap-save
FIR, 64-channel shared-FFT channelizer, chunk-parallel MM) this measures
throughput with the validated harness (utils/speed_tester), then
computes the fraction of two ceilings:

- **HBM bound**: minimum bytes/sample the kernel must move (one read +
  one write of its streams at their dtypes) against the chip's HBM
  bandwidth. Streaming DSP at these arithmetic intensities is memory
  bound on every TPU generation, so this is the binding roofline.
- **Compute anchor**: the kernel's useful FLOPs against the measured
  true-f32 matmul rate from calibrate_sync — the EMPIRICAL compute
  ceiling through the tunnel in this very window, so numbers compare
  across tunnel-health states.

Chip peaks (public specs; bf16 MXU peak and HBM GB/s):
  v5e  197 TF, 819 GB/s   v5p 459 TF, 2765 GB/s   v4 275 TF, 1228 GB/s
  v6e  918 TF, 1640 GB/s  (unknown kinds fall back to --hbm-gbps)

Usage: python tools/roofline.py [--cpu] [--hbm-gbps N] [--sweep]
Prints a table: kernel, Msamp/s, min bytes/sample, achieved GB/s,
%HBM-SoL, useful FLOPs/sample, achieved TFLOP/s, %of-calibration.

--sweep runs the LAUNCH-BATCHING experiment (VERDICT r4 #1): the r4
reading had the flagship kernels at 2-5% of HBM speed-of-light with
"per-launch overhead" as the named-but-untested diagnosis. The sweep

1. measures the EMPIRICAL memory ceiling of this backend/tunnel with a
   trivial elementwise axpy kernel across block sizes (if even that
   plateaus far below the HBM spec, the spec is the wrong denominator
   for every other row — the plateau is the honest speed of light
   through this harness);
2. re-measures each flagship kernel with B blocks of 2^20 fused into
   ONE dispatch (B = 1..8; the speed-tester scan already amortizes
   host launches, so B scales the work per scan step) and reports
   %HBM-SoL and %empirical-ceiling per B;
3. fits t(B) = a + b*B per kernel: ``a`` IS the measured per-dispatch
   overhead (ms) and 1/b the asymptotic rate — the "number, not a
   sentence" for the overhead floor.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HBM_GBPS = {
    "v5e": 819.0, "v5litepod": 819.0, "v5 lite": 819.0, "v5p": 2765.0,
    "v4": 1228.0, "v6e": 1640.0, "v6": 1640.0, "cpu": 50.0,
}


def _device_hbm(argv) -> tuple[str, float]:
    if "--hbm-gbps" in argv:
        return "manual", float(argv[argv.index("--hbm-gbps") + 1])
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for key, bw in HBM_GBPS.items():
        if key in kind:
            return kind, bw
    return kind, float("nan")


def sweep():
    """Launch-batching experiment (see module docstring)."""
    import jax
    import jax.numpy as jnp

    from sdrpp_tpu.ops import taps as taps_mod
    from sdrpp_tpu.ops.channelizer import FFTChannelizerBank
    from sdrpp_tpu.ops.fir import FIR
    from sdrpp_tpu.ops.spectrum import SpectrumFFT
    from sdrpp_tpu.utils.blocks import Block
    from sdrpp_tpu.utils.speed_tester import calibrate_sync, speed_test

    kind, hbm = _device_hbm(sys.argv)
    cal = calibrate_sync(size=1024 if "--cpu" in sys.argv else 2048,
                         iters=8)
    print(f"device: {kind}  HBM spec {hbm:.0f} GB/s  "
          f"calibration {cal['tflops']:.1f} TFLOP/s true-f32", flush=True)

    # --- 1. empirical memory ceiling ---
    # STATEFUL axpy: state' = state*c + x. The first (stateless y=2x+1)
    # version read 184% of the HBM spec on the chip: the sum-checksum let
    # XLA fold the elementwise op into the reduction (a pure 4 B/sample
    # read, no write). The carried-array form cannot fold — the carry
    # feeds the next scan iteration — so it genuinely moves
    # read(state) + read(x) + write(state) = 12 B/sample.
    class _Axpy(Block):
        def __init__(self, n):
            self.n = n

        def init_state(self):
            return jnp.zeros(self.n, jnp.float32)

        def __call__(self, state, x):
            s = state * np.float32(0.9997) + x
            return s, s

    print("\nempirical memory ceiling (stateful f32 axpy, 12 B/sample):")
    print(f"{'block':>10} {'us/blk':>10} {'GB/s':>8} {'%HBMspec':>9}")
    ceiling = 0.0
    for logs in (20, 21, 22, 23, 24, 25):
        m = speed_test(_Axpy(1 << logs), 1 << logs, dtype=jnp.float32,
                       iters=8)
        gbs = m["samples_per_sec"] * 12.0 / 1e9
        ceiling = max(ceiling, gbs)
        print(f"{1 << logs:>10} {m['time_per_block_us']:>10.1f} "
              f"{gbs:>8.1f} {100 * gbs / hbm:>9.1f}", flush=True)
    print(f"empirical ceiling: {ceiling:.1f} GB/s "
          f"({100 * ceiling / hbm:.1f}% of the HBM spec)")

    # --- 2. flagship kernels, B blocks of 2^20 per dispatch ---
    # Two batching shapes: "wide" grows the 1-D block to B<<20 (the FFT
    # length / overlap-save plan grows with it — superlinear FFT cost),
    # "batch" keeps 2^20-sample blocks and adds a leading [B] axis (B
    # independent streams in one dispatch — the shape a multi-VFO /
    # multi-capture server actually runs). FIR broadcasts over lead axes
    # natively; the single-stream channelizer is vmapped.
    class _VmapB(Block):
        def __init__(self, mk, B):
            self.inner = mk()
            self.B = B

        def init_state(self):
            st = self.inner.init_state()
            return jax.tree_util.tree_map(
                lambda a: jnp.stack([jnp.asarray(a)] * self.B), st)

        def __call__(self, state, x):
            return jax.vmap(self.inner)(state, x)

    taps255 = taps_mod.low_pass(0.1, 0.02, 1.0)[:255]

    def mk_chan():
        return FFTChannelizerBank(
            np.linspace(-2.4e6, 2.4e6, 64), 6144000.0, 48000.0,
            bandwidth=12500.0)

    from sdrpp_tpu.ops import fir as fir_mod

    kernels = [
        # (name, make_block(B) -> (block, n, lead_shape), bytes/sample,
        #  fir_mode)
        ("spectrum 1M-FFT [wide]",
         lambda B: (_spec1m_block(SpectrumFFT, Block), B << 20, ()), 12.0,
         None),
        ("FIR 255t c64 [wide]",
         lambda B: (FIR(taps255), B << 20, ()), 16.0, None),
        ("FIR 255t c64 [batch]",
         lambda B: (FIR(taps255, lead_shape=(B,)), 1 << 20, (B,)), 16.0,
         None),
        # NOTE: direct strided-conv FIR variants were tried and REMOVED:
        # at 1M-sample streams the conv lowering stalls for tens of
        # minutes on the tunnel even with a small batch axis — the r1
        # "batch-1 conv underutilizes the MXU" finding is terminal at
        # these lengths (the conv path's sweet spot, many channels x
        # short blocks, is the channelizer/bank rows' shape and is what
        # the library auto-selects it for).
        ("channelizer 64ch /128 [wide]",
         lambda B: (mk_chan(), B << 20, ()), 8.0 + 64 * 8.0 / 128, None),
        ("channelizer 64ch /128 [batch]",
         lambda B: (_VmapB(mk_chan, B), 1 << 20, (B,)),
         8.0 + 64 * 8.0 / 128, None),
    ]
    fits = []
    for name, make, bps, fmode in kernels:
        saved_mode = fir_mod.FIR_MODE
        if fmode is not None:
            fir_mod.FIR_MODE = fmode  # read at trace time
        print(f"\n{name} (bytes/sample {bps:.1f}):")
        print(f"{'B':>3} {'n/dispatch':>11} {'us/dispatch':>12} "
              f"{'Msamp/s':>9} {'GB/s':>8} {'%HBMspec':>9} {'%ceil':>6}")
        ts, bs = [], []
        for B in (1, 2, 4, 8):
            blk, n, lead = make(B)
            m = speed_test(blk, n, iters=8, lead_shape=lead)
            sps = m["samples_per_sec"]
            gbs = sps * bps / 1e9
            ts.append(m["time_per_block_us"])
            bs.append(B)
            print(f"{B:>3} {B << 20:>11} {m['time_per_block_us']:>12.1f} "
                  f"{sps / 1e6:>9.1f} {gbs:>8.1f} "
                  f"{100 * gbs / hbm:>9.1f} {100 * gbs / ceiling:>6.1f}",
                  flush=True)
        # least-squares t(B) = a + b*B  ->  a = per-dispatch overhead
        b_arr = np.asarray(bs, np.float64)
        A = np.stack([np.ones_like(b_arr), b_arr], -1)
        (a, b), *_ = np.linalg.lstsq(A, np.asarray(ts, np.float64),
                                     rcond=None)
        asym = (1 << 20) / max(b, 1e-9)  # samples/us asymptotic
        fits.append((name, a, b, asym * bps / 1e3))
        print(f"fit: t(B) = {a:.0f} us + {b:.0f} us * B  ->  "
              f"per-dispatch overhead {a / 1e3:.2f} ms, asymptotic "
              f"{asym:.1f} Msamp/s = {asym * bps / 1e3:.1f} GB/s "
              f"({100 * asym * bps / 1e3 / ceiling:.1f}% of ceiling)")
        fir_mod.FIR_MODE = saved_mode

    cal2 = calibrate_sync(size=1024 if "--cpu" in sys.argv else 2048,
                          iters=8)
    print(f"\ncalibration after: {cal2['tflops']:.1f} TFLOP/s")
    print("\nsummary (per-dispatch overhead a, asymptotic GB/s):")
    for name, a, b, gbs in fits:
        print(f"  {name:<28} a={a / 1e3:6.2f} ms   asym={gbs:6.1f} GB/s")


def _spec1m_block(SpectrumFFT, Block):
    class _Spec1M(Block):
        def __init__(self):
            self.s = SpectrumFFT(1 << 20, 100e6, 100e6 / (1 << 20))

        def __call__(self, state, x):
            return state, self.s(x)

    return _Spec1M()


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    if "--sweep" in sys.argv:
        return sweep()
    import jax.numpy as jnp

    from sdrpp_tpu.models.digital import MeteorDemod
    from sdrpp_tpu.ops import taps as taps_mod
    from sdrpp_tpu.ops.channelizer import FFTChannelizerBank
    from sdrpp_tpu.ops.fir import FIR
    from sdrpp_tpu.ops.spectrum import SpectrumFFT
    from sdrpp_tpu.utils.blocks import Block
    from sdrpp_tpu.utils.speed_tester import calibrate_sync, speed_test

    kind, hbm = _device_hbm(sys.argv)
    cal = calibrate_sync(size=1024 if "--cpu" in sys.argv else 2048,
                         iters=8)
    print(f"device: {kind}  HBM {hbm:.0f} GB/s  "
          f"calibration {cal['tflops']:.1f} TFLOP/s true-f32", flush=True)

    n = 1 << 20
    rows = []

    def add(name, meas, bytes_per_sample, flops_per_sample):
        sps = meas["samples_per_sec"]
        gbs = sps * bytes_per_sample / 1e9
        tf = sps * flops_per_sample / 1e12
        rows.append((name, sps / 1e6, bytes_per_sample, gbs,
                     100.0 * gbs / hbm if hbm == hbm else float("nan"),
                     flops_per_sample, tf,
                     100.0 * tf / cal["tflops"]))

    # 1M-point spectrum FFT: c64 in (8 B), f32 PSD out (4 B) -> 12 B/s.
    # FLOPs ~ 5 N log2 N / N = 5*20 per sample + |.|^2 (3).
    class _Spec1M(Block):
        def __init__(self):
            self.s = SpectrumFFT(1 << 20, 100e6, 100e6 / (1 << 20))

        def __call__(self, state, x):
            return state, self.s(x)

    add("spectrum 1M-FFT", speed_test(_Spec1M(), n, iters=10),
        12.0, 5.0 * 20 + 3)

    # 255-tap FIR on c64 (overlap-save/direct per SDRPP_TPU_FIR):
    # 8 B in + 8 B out; useful FLOPs = 8*T per sample (c64 MAC = 8).
    taps255 = taps_mod.low_pass(0.1, 0.02, 1.0)[:255]
    add("FIR 255t c64", speed_test(FIR(taps255), n), 16.0, 8.0 * 255)

    # 64-ch shared-FFT channelizer /128: 8 B in, 64 ch x 8 B / 128 out
    # = 12 B/sample; FLOPs ~ one 8k FFT pass (5 log2 8192 = 65) +
    # per-channel pruned IFFT+filter amortized (~64 * 65 / 128 = 32.5).
    add("channelizer 64ch /128",
        speed_test(FFTChannelizerBank(
            np.linspace(-2.4e6, 2.4e6, 64), 6144000.0, 48000.0,
            bandwidth=12500.0), n),
        8.0 + 64 * 8.0 / 128, 65.0 + 32.5)

    # chunk-parallel MM (meteor chain): dominated by the windowed
    # interpolation (J-band one-hot + taps). 8 B in + symbol out ~ 4 B;
    # useful FLOPs/sample ~ (2 passes * (T*J + p*J) MACs * 2) / omega.
    add("meteor chain (RRC+AGC+Costas+MM)",
        speed_test(MeteorDemod(72000.0, 150000.0), 1 << 19, iters=5),
        12.0, 300.0)

    print(f"{'kernel':<32} {'Msamp/s':>9} {'B/smp':>6} {'GB/s':>8} "
          f"{'%HBM':>6} {'FLOP/smp':>9} {'TFLOP/s':>8} {'%cal':>6}")
    for r in rows:
        print(f"{r[0]:<32} {r[1]:>9.1f} {r[2]:>6.1f} {r[3]:>8.1f} "
              f"{r[4]:>6.1f} {r[5]:>9.0f} {r[6]:>8.3f} {r[7]:>6.1f}")
    cal2 = calibrate_sync(size=1024 if "--cpu" in sys.argv else 2048,
                          iters=8)
    print(f"calibration after: {cal2['tflops']:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
