"""Tunnel-health watcher: log the matmul calibration every few minutes.

Round-4 context: every r4 measurement landed in the degraded 29-33
TFLOP/s band; the healthy band (69-79, PERFORMANCE.md r2) never
appeared. This tool samples the calibration on a fixed cadence and
appends one JSON line per sample to ``cal_watch.jsonl`` so a healthy
window can be caught and the headline bench re-run inside it.

Usage: python tools/cal_watch.py [--interval 180] [--out cal_watch.jsonl]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=180.0)
    ap.add_argument("--out", default="cal_watch.jsonl")
    ap.add_argument("--count", type=int, default=0, help="0 = forever")
    args = ap.parse_args()

    from sdrpp_tpu.utils.speed_tester import calibrate_sync

    i = 0
    while True:
        try:
            cal = calibrate_sync()
            rec = {"ts": time.time(), "tflops": round(cal["tflops"], 1),
                   "matmul_ms": round(cal["matmul_ms"], 4)}
        except Exception as e:  # tunnel hiccup: record and keep watching
            rec = {"ts": time.time(), "error": str(e)[:200]}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)
        i += 1
        if args.count and i >= args.count:
            break
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
