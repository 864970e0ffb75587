"""Reproducible broadcast-FM STEREO bank benchmark (the PERFORMANCE.md
"N stations simultaneously" figure).

Measures aggregate input throughput of a ScannerBank(mode="wfm") — fft
channelizer + lane-batched pilot PLL + full stereo matrix decode to 48k
audio per station — with the honest serial-steps/checksum harness.

Usage: python tools/bench_wfm_bank.py [--cpu] [--stations 16]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--stations", type=int, default=16)
    ap.add_argument("--block", type=int, default=1 << 18)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sdrpp_tpu.parallel.vfo_bank import ScannerBank
    from sdrpp_tpu.utils.speed_tester import speed_test

    C = args.stations
    fs = 240000.0 * C  # one 240k station slot per channel
    offsets = (np.arange(C) - C / 2 + 0.5) * 240000.0
    bank = ScannerBank(offsets, fs, mode="wfm", if_rate=240000.0,
                       bandwidth=200000.0, channelizer="fft")
    n = (args.block // bank.block_multiple) * bank.block_multiple
    r = speed_test(bank, n)
    msps = r["samples_per_sec"] / 1e6
    print(f"{C}-station WFM stereo bank: {msps:.1f} Msamp/s input "
          f"({msps * 1e6 / fs:.1f}x realtime for all {C} stations, "
          f"block={n}, backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
