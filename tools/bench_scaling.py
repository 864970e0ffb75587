"""Weak-scaling benchmark: channel-sharded scanner bank over an N-device mesh.

BASELINE metric: samples/s scaling efficiency at 1 chip / 1 host / N hosts.
With one real chip available, this harness demonstrates the measurement on
the virtual CPU mesh (xla_force_host_platform_device_count) — channels per
device held constant, devices swept 1..8; efficiency = rate(N) / (N *
rate(1)). The same script runs unchanged on a real pod slice.

Usage: python tools/bench_scaling.py [--channels-per-dev 8] [--block 65536]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels-per-dev", type=int, default=8)
    ap.add_argument("--block", type=int, default=65536)
    ap.add_argument("--devices", type=int, default=0, help="0 = all available")
    ap.add_argument("--cpu-virtual", type=int, default=8,
                    help="force N virtual CPU devices (0 = use real backend)")
    args = ap.parse_args()

    if args.cpu_virtual:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.cpu_virtual}")
    import jax

    if args.cpu_virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sdrpp_tpu.parallel.mesh import make_mesh
    from sdrpp_tpu.parallel.vfo_bank import ScannerBank

    if args.cpu_virtual:
        print("NOTE: virtual CPU devices share the same physical cores — "
              "efficiency here validates the HARNESS, not real scaling; "
              "run with --cpu-virtual 0 on a pod slice for real numbers.")
    ndev_all = args.devices or len(jax.devices())
    fs_in = 2048000.0
    results = {}
    n = args.block

    sweep = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev_all]
    for ndev in sweep:
        channels = args.channels_per_dev * ndev
        offsets = np.linspace(-fs_in * 0.4, fs_in * 0.4, channels)
        bank = ScannerBank(offsets, fs_in, mode="nfm", if_rate=32000.0,
                           bandwidth=12500.0)
        mesh = make_mesh(ndev, 1, devices=jax.devices()[:ndev])
        state, in_sh, out_sh = bank.shard(mesh, bank.init_state())
        step = jax.jit(bank, in_shardings=(None, in_sh), out_shardings=(None, out_sh))
        rng = np.random.default_rng(0)
        x = jax.device_put(jnp.asarray(
            (rng.standard_normal(n) + 1j * rng.standard_normal(n))
            .astype(np.complex64)), in_sh)

        state, y = step(state, x)
        jax.block_until_ready(y)  # fine on CPU; axon needs checksum sync
        iters = 8
        t0 = time.perf_counter()
        st = state
        for _ in range(iters):
            st, y = step(st, x)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / iters
        agg = channels * n / dt
        results[ndev] = agg
        base = results[sweep[0]] * (ndev / sweep[0])
        eff = agg / base
        print(f"devices={ndev:2d} channels={channels:3d}: "
              f"{agg / 1e6:8.1f} Maggsamp/s  weak-scaling eff={eff:5.2f}")


if __name__ == "__main__":
    main()
