"""Per-kernel roofline sweep on the current backend (TPU by default).

Usage: python tools/bench_kernels.py [--cpu] [--quick]
Prints a samples/s table for every hot kernel (the SpeedTester sweep the
reference lacks, SURVEY §4 implication (e))."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sdrpp_tpu.models.analog import AMDemod, WFMDemod
    from sdrpp_tpu.ops import taps as taps_mod
    from sdrpp_tpu.ops.fir import FIR, DecimatingFIR
    from sdrpp_tpu.ops.fm import Quadrature
    from sdrpp_tpu.ops.fm_if import FMIFNoiseReduction
    from sdrpp_tpu.ops.mix import FrequencyXlator, FrequencyXlatorBank
    from sdrpp_tpu.ops.resample import PowerDecimator, RationalResampler
    from sdrpp_tpu.ops.scans import AGC, DCBlocker, Deemphasis, FastAGC, PLL
    from sdrpp_tpu.ops.spectrum import SpectrumFFT
    from sdrpp_tpu.utils.blocks import Block
    from sdrpp_tpu.utils.speed_tester import report_table, speed_test

    quick = "--quick" in sys.argv
    n = 1 << (16 if quick else 20)
    na = 1 << (14 if quick else 16)  # audio-rate blocks
    results = {}

    taps255 = taps_mod.low_pass(0.1, 0.02, 1.0)[:255]
    results["mix (NCO)"] = speed_test(FrequencyXlator(0.1e6, 10e6), n)
    results["mix bank x64"] = speed_test(
        FrequencyXlatorBank(np.linspace(-4e6, 4e6, 64), 10e6), n // 8)
    results[f"FIR {len(taps255)}t (FFT conv)"] = speed_test(FIR(taps255), n)
    results["DecimFIR /16"] = speed_test(
        DecimatingFIR(taps_mod.low_pass(0.03, 0.008, 1.0)[:128], 16), n)
    results["PowerDecim /128"] = speed_test(PowerDecimator(128), n)
    rr = RationalResampler(240000.0, 48000.0)
    results["RationalResamp 240k->48k"] = speed_test(
        rr, (n // rr.block_multiple) * rr.block_multiple)
    results["DCBlocker (assoc scan)"] = speed_test(DCBlocker(1e-4), n)
    results["Deemphasis (assoc scan)"] = speed_test(
        Deemphasis(50e-6, 48000.0), n, dtype=jnp.float32)
    results["Quadrature FM"] = speed_test(Quadrature(75000.0, 240000.0), n)
    results["AGC (seq scan)"] = speed_test(
        AGC(1.0, 0.01, 0.001, 1e6, 10.0, float("inf")), na, dtype=jnp.float32)
    results["FastAGC (seq scan)"] = speed_test(FastAGC(1.0, 1e6, 0.01), na)
    results["PLL (seq scan)"] = speed_test(PLL(0.01), na)
    results["FMIF NR 32"] = speed_test(FMIFNoiseReduction(32), na)

    class _Spec(Block):
        def __init__(self):
            self.s = SpectrumFFT(65536, 10e6, 10e6 / 65536)

        def __call__(self, state, x):
            return state, self.s(x)

    results["Spectrum 64k-FFT"] = speed_test(_Spec(), n)

    class _Spec1M(Block):
        def __init__(self):
            self.s = SpectrumFFT(1 << 20, 100e6, 100e6 / (1 << 20))

        def __call__(self, state, x):
            return state, self.s(x)

    results["Spectrum 1M-FFT"] = speed_test(_Spec1M(), 1 << 20, iters=10)

    results["WFM stereo demod"] = speed_test(
        WFMDemod(75000.0, 240000.0), n)
    results["AM demod (AGC-bound)"] = speed_test(
        AMDemod(12000.0, 24000.0), na)

    print(report_table(results))


if __name__ == "__main__":
    main()
