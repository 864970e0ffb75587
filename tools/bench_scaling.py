"""Weak-scaling benchmark: channel-sharded scanner bank over an N-device mesh.

BASELINE metric: samples/s scaling efficiency at 1 chip / 1 host / N hosts.
With one real chip available, this harness demonstrates the measurement on
the virtual CPU mesh (xla_force_host_platform_device_count) — channels per
device held constant, devices swept 1..8; efficiency = rate(N) / rate(1)
per-device-normalized. The same script runs unchanged on a real pod slice.

Two modes:
  single-process sweep (default):
      python tools/bench_scaling.py [--channels-per-dev 8] [--block 65536]
  2-process jax.distributed "fake pod" (the tests/test_multihost.py
  topology — VERDICT r1 #10: record efficiency + a collective/SPMD
  overhead breakdown so the first real-pod run has a baseline shape):
      python tools/bench_scaling.py --multiproc 2

The bank runs the PRODUCTION shard_map path (ScannerBank.sharded_step);
the breakdown row times the same per-device workload with no mesh at all
(pure local bank), so
    overhead = 1 - t_local / t_sharded
isolates what shard_map + GSPMD plumbing (and on a real pod, the
collectives) cost on top of the local compute.
"""

import argparse
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _bench_step(step, state, x, iters=8):
    import jax
    state, y = step(state, x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    st = state
    for _ in range(iters):
        st, y = step(st, x)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def _make_bank(channels, fs_in):
    import numpy as np

    from sdrpp_tpu.parallel.vfo_bank import ScannerBank

    offsets = np.linspace(-fs_in * 0.4, fs_in * 0.4, channels)
    return ScannerBank(offsets, fs_in, mode="nfm", if_rate=32000.0,
                       bandwidth=12500.0)


def single_process(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding

    from sdrpp_tpu.parallel.mesh import make_mesh

    if args.cpu_virtual:
        print("NOTE: virtual CPU devices share the same physical cores — "
              "efficiency here validates the HARNESS, not real scaling; "
              "run with --cpu-virtual 0 on a pod slice for real numbers.")
    ndev_all = args.devices or len(jax.devices())
    fs_in = 2048000.0
    n = args.block
    rng = np.random.default_rng(0)
    xh = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    results = {}
    sweep = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev_all]
    for ndev in sweep:
        channels = args.channels_per_dev * ndev
        bank = _make_bank(channels, fs_in)
        mesh = make_mesh(ndev, 1, devices=jax.devices()[:ndev])
        step, specs = bank.sharded_step(mesh)
        state = jax.tree_util.tree_map(
            lambda l, s: jax.device_put(l, NamedSharding(mesh, s)),
            bank.init_state(), specs)
        dt = _bench_step(step, state, jnp.asarray(xh))
        agg = channels * n / dt
        results[ndev] = agg
        eff = agg / (results[sweep[0]] * ndev / sweep[0])
        print(f"devices={ndev:2d} channels={channels:3d}: "
              f"{agg / 1e6:8.1f} Maggsamp/s  weak-scaling eff={eff:5.2f}")

    # breakdown: same per-device workload, no mesh (pure local compute)
    bank1 = _make_bank(args.channels_per_dev, fs_in)
    st1 = bank1.init_state()
    f1 = jax.jit(bank1)
    dt_local = _bench_step(f1, st1, jnp.asarray(xh))
    d_last = sweep[-1]
    dt_shard = args.channels_per_dev * d_last * n / results[d_last] / d_last
    print(f"per-device breakdown: local {dt_local * 1e3:.1f} ms/blk vs "
          f"sharded {dt_shard * 1e3:.1f} ms/blk -> shard_map/collective "
          f"overhead {max(0.0, 1 - dt_local / dt_shard) * 100:.0f}%")

    # time-sharded NFM (VERDICT r4 #6): fixed per-SHARD work, shards
    # swept — bounds the halo-exchange (collective_permute) + serialized
    # scan-carry overheads of the long-IQ-sequence axis structurally,
    # even where virtual devices make absolute rates meaningless
    from jax.sharding import Mesh

    from sdrpp_tpu.parallel.time_shard import make_time_step_nfm

    print("\ntime-sharded NFM (per-shard work fixed at "
          f"{args.block} samples):")
    results_t = {}
    for ndev in sweep:
        block = args.block * ndev
        mesh = Mesh(np.asarray(jax.devices()[:ndev]), ("time",))
        step, init = make_time_step_nfm(mesh, 100000.0, fs_in, 12500.0,
                                        block)
        xt = (rng.standard_normal(block)
              + 1j * rng.standard_normal(block)).astype(np.complex64)
        dt = _bench_step(step, init(), jnp.asarray(xt))
        rate = block / dt
        results_t[ndev] = rate
        eff = rate / (results_t[sweep[0]] * ndev / sweep[0])
        print(f"shards={ndev:2d} block={block:8d}: {rate / 1e6:8.1f} "
              f"Msamp/s  weak-scaling eff={eff:5.2f}")


def multiproc_parent(args):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = str(ROOT) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker", str(i),
         "--multiproc", str(args.multiproc), "--port", str(port),
         "--channels-per-dev", str(args.channels_per_dev),
         "--block", str(args.block)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(args.multiproc)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(f"worker {i} FAILED:\n{o}")
            return 1
    print(outs[0], end="")
    return 0


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def multiproc_worker(args):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding

    from sdrpp_tpu.parallel.multihost import (distributed_init,
                                              global_channel_mesh,
                                              put_global)

    distributed_init(f"127.0.0.1:{args.port}", args.multiproc, args.worker)
    ndev = len(jax.devices())
    nloc = len(jax.local_devices())
    channels = args.channels_per_dev * ndev
    fs_in = 2048000.0
    n = args.block
    bank = _make_bank(channels, fs_in)
    mesh = global_channel_mesh()
    step, specs = bank.sharded_step(mesh)
    state = jax.tree_util.tree_map(
        lambda l, s: put_global(l, NamedSharding(mesh, s)),
        bank.init_state(), specs)
    rng = np.random.default_rng(0)
    xh = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64)
    from jax.sharding import PartitionSpec as P
    x = put_global(xh, NamedSharding(mesh, P()))
    dt = _bench_step(step, state, x)
    agg = channels * n / dt

    # local-only baseline on THIS process's devices: what the same
    # per-host workload costs with no cross-host program at all
    bank_l = _make_bank(args.channels_per_dev * nloc, fs_in)
    from sdrpp_tpu.parallel.mesh import make_mesh
    lmesh = make_mesh(nloc, 1, devices=jax.local_devices())
    lstep, lspecs = bank_l.sharded_step(lmesh)
    lstate = jax.tree_util.tree_map(
        lambda l, s: jax.device_put(l, NamedSharding(lmesh, s)),
        bank_l.init_state(), lspecs)
    dt_local = _bench_step(lstep, lstate, jnp.asarray(xh))

    if args.worker == 0:
        agg_local = args.channels_per_dev * nloc * n / dt_local
        eff = agg / (agg_local * args.multiproc)
        print(f"fake pod: {args.multiproc} processes x {nloc} devices, "
              f"{channels} channels")
        print(f"  distributed: {agg / 1e6:8.1f} Maggsamp/s "
              f"({dt * 1e3:.1f} ms/blk)")
        print(f"  1-host local baseline x{args.multiproc}: "
              f"{agg_local * args.multiproc / 1e6:8.1f} Maggsamp/s "
              f"({dt_local * 1e3:.1f} ms/blk)")
        print(f"  weak-scaling efficiency vs local: {eff:5.2f}   "
              f"cross-host/SPMD overhead: "
              f"{max(0.0, 1 - dt_local / dt) * 100:.0f}% of step time")
        print("  NOTE: CPU fake pod (both processes share this machine's "
              "cores + loopback DCN) — the SHAPE of the breakdown is the "
              "baseline for the first real pod run, not the ratios.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels-per-dev", type=int, default=8)
    ap.add_argument("--block", type=int, default=65536)
    ap.add_argument("--devices", type=int, default=0, help="0 = all available")
    ap.add_argument("--cpu-virtual", type=int, default=8,
                    help="force N virtual CPU devices (0 = use real backend)")
    ap.add_argument("--multiproc", type=int, default=0,
                    help="run N jax.distributed processes (fake pod)")
    ap.add_argument("--worker", type=int, default=None, help="internal")
    ap.add_argument("--port", type=int, default=0, help="internal")
    args = ap.parse_args()

    if args.worker is not None:
        return multiproc_worker(args)
    if args.multiproc:
        return multiproc_parent(args)

    if args.cpu_virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_virtual}")
    import jax
    if args.cpu_virtual:
        jax.config.update("jax_platforms", "cpu")
    return single_process(args)


if __name__ == "__main__":
    sys.exit(main() or 0)
