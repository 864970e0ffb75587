"""Tunnel-health watcher: log the matmul calibration every few minutes.

Round-4 context: every r4 measurement landed in the degraded 29-33
TFLOP/s band; the healthy band (69-79, PERFORMANCE.md r2) never
appeared. This tool samples the calibration on a fixed cadence and
appends one JSON line per sample to ``cal_watch.jsonl`` so a healthy
window can be caught and the headline bench re-run inside it.

Round-5 hardening (VERDICT r4 #5 + the r4 concurrency finding that a
watcher probing alongside another TPU client reads 1.7 TFLOP/s and
corrupts BOTH runs):

- every probe runs in a FRESH subprocess (one tunnel connect, one
  calibration, exit) so the watcher never holds a long-lived client and
  a poisoned backend cannot accumulate across samples;
- probes serialize against every other TPU job in this repo via an
  advisory flock on ``--lock`` (default /tmp/sdrpp_tpu_tpu.lock). A
  busy lock SKIPS the sample and records {"skipped": "lock busy"} — a
  skipped sample is honest, a contended one is garbage. Wrap your own
  TPU runs with ``flock /tmp/sdrpp_tpu_tpu.lock <cmd>`` (or
  tools/tpu_lock.sh) so the watcher stays out of their way.

Usage: python tools/cal_watch.py [--interval 240] [--out cal_watch.jsonl]
"""
from __future__ import annotations

import argparse
import fcntl
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PROBE = r"""
import json, time
t0 = time.time()
from sdrpp_tpu.utils.speed_tester import calibrate_sync
cal = calibrate_sync()
print("CAL " + json.dumps({"tflops": round(cal["tflops"], 1),
                           "matmul_ms": round(cal["matmul_ms"], 4),
                           "probe_secs": round(time.time() - t0, 1)}))
"""


def sample_once(lock_path: str, timeout: float = 900.0) -> dict:
    """One calibration sample: take the TPU lock (non-blocking), run the
    probe in a fresh subprocess, release. Returns the record."""
    lk = open(lock_path, "a+")
    try:
        try:
            fcntl.flock(lk, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            return {"ts": time.time(), "skipped": "lock busy"}
        try:
            r = subprocess.run(
                [sys.executable, "-c", PROBE],
                cwd=str(Path(__file__).resolve().parent.parent),
                capture_output=True, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            return {"ts": time.time(), "error": f"probe timeout {timeout}s"}
        for line in r.stdout.splitlines():
            if line.startswith("CAL "):
                rec = json.loads(line[4:])
                rec["ts"] = time.time()
                return rec
        return {"ts": time.time(), "error":
                (r.stderr.strip()[-200:] or f"rc={r.returncode}")}
    finally:
        lk.close()  # releases the flock


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=240.0)
    ap.add_argument("--out", default="cal_watch.jsonl")
    ap.add_argument("--count", type=int, default=0, help="0 = forever")
    ap.add_argument("--lock", default="/tmp/sdrpp_tpu_tpu.lock")
    args = ap.parse_args()

    i = 0
    while True:
        try:
            rec = sample_once(args.lock)
        except Exception as e:  # the campaign must outlive any hiccup
            rec = {"ts": time.time(),
                   "error": f"{type(e).__name__}: {e}"[:200]}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)
        i += 1
        if args.count and i >= args.count:
            break
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
