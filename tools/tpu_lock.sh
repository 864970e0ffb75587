#!/bin/sh
# Serialize TPU-touching commands against each other and against the
# calibration watcher (tools/cal_watch.py). Two concurrent tunnel
# clients corrupt BOTH runs (verify skill, r4 findings), so every
# TPU job in this repo should run as:
#
#   tools/tpu_lock.sh python bench.py ...
#
# Blocks until the lock is free (the watcher skips its sample instead).
exec flock /tmp/sdrpp_tpu_tpu.lock "$@"
