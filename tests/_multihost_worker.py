"""Worker process for the real multi-process jax.distributed test.

Launched by tests/test_multihost.py: N of these form a fake pod (each
process owns 4 virtual CPU devices), initialize jax.distributed against a
shared coordinator, and run a channel-sharded MultiHostReceiver over
deterministic IQ. Process 0 writes the gathered audio for the pytest
process to compare against the unsharded single-process result.

Not a test module (leading underscore keeps pytest from collecting it).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = int(sys.argv[3])
    out_path = sys.argv[4]

    from sdrpp_tpu.parallel.multihost import MultiHostReceiver

    channels = 8
    fs_in = 256000.0
    offsets = np.linspace(-100000.0, 100000.0, channels)
    rx = MultiHostReceiver(offsets, fs_in, mode="usb", if_rate=32000.0,
                           bandwidth=2700.0,
                           coordinator=f"127.0.0.1:{port}",
                           num_processes=num_processes,
                           process_id=process_id)
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == num_processes * len(jax.local_devices())

    # Deterministic wideband blocks, identical on every host.
    rng = np.random.default_rng(1234)
    n = rx.block_multiple * max(1, 8192 // rx.block_multiple)
    t = np.arange(2 * n) / fs_in
    sig = sum(0.1 * np.exp(2j * np.pi * f * t)
              for f in (-100000.0, -20000.0, 60000.0))
    iq = (sig + 0.01 * (rng.standard_normal(2 * n)
                        + 1j * rng.standard_normal(2 * n))).astype(np.complex64)

    audio1 = rx.gather_audio(rx.process_block(iq[:n]))
    audio2 = rx.gather_audio(rx.process_block(iq[n:]))

    if process_id == 0:
        np.savez(out_path, audio1=audio1, audio2=audio2, n=n)
    print(f"worker {process_id} done", flush=True)


if __name__ == "__main__":
    main()
