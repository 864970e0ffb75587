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

Usage: python tools/roofline.py [--cpu] [--hbm-gbps N]
Prints a table: kernel, Msamp/s, min bytes/sample, achieved GB/s,
%HBM-SoL, useful FLOPs/sample, achieved TFLOP/s, %of-calibration.
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


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
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
