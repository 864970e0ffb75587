"""StepWatchdog failure-detection/recovery (SURVEY §5 elastic-recovery
plan: retries, re-trace on poisoned executables, checkpoint-restore)."""

import time

import numpy as np
import pytest

from sdrpp_tpu.utils.watchdog import StepTimeout, StepWatchdog


def test_passthrough_success():
    wd = StepWatchdog(lambda: (lambda s, x: (s + 1, x * 2)))
    s, y = wd(0, 21)
    assert (s, y) == (1, 42)
    assert wd.steps == 1 and wd.total_failures == 0


def test_retries_then_succeeds():
    calls = {"n": 0}

    def make_step():
        def step(s, x):
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("transient backend flake")
            return s, x
        return step

    events = []
    wd = StepWatchdog(make_step, max_retries=5, backoff_s=0.0,
                      on_event=lambda kind, **kw: events.append(kind))
    s, y = wd(0, 7)
    assert y == 7
    assert wd.total_failures == 2
    assert "failure" in events and "rejit" in events  # re-traced on 2nd fail


def test_gives_up_after_max_retries():
    def make_step():
        def step(s, x):
            raise RuntimeError("permanent")
        return step

    wd = StepWatchdog(make_step, max_retries=2, backoff_s=0.0)
    with pytest.raises(RuntimeError):
        wd(0, 1)
    assert wd.total_failures == 3  # initial + 2 retries


def test_timeout_fires():
    def make_step():
        def step(s, x):
            time.sleep(5.0)
            return s, x
        return step

    wd = StepWatchdog(make_step, timeout_s=0.2, max_retries=0)
    with pytest.raises(StepTimeout):
        wd(0, 1)


def test_checkpoint_and_restore(tmp_path):
    import jax.numpy as jnp

    ckpt = tmp_path / "wd.ckpt"
    wd = StepWatchdog(lambda: (lambda s, x: (s + x, x)),
                      checkpoint_path=str(ckpt), checkpoint_every=1)
    state = jnp.zeros(())
    for i in range(3):
        out = wd(state, jnp.float32(1.0), offset=i + 1)  # resume point
        state = out[0]
    assert ckpt.exists()
    # crash-level restore: a fresh watchdog reads the checkpoint file
    wd2 = StepWatchdog(lambda: (lambda s, x: (s + x, x)),
                       checkpoint_path=str(ckpt))
    restored, offset = wd2.restore(jnp.zeros(()))
    assert float(restored) == 3.0
    assert offset == 3


def test_checkpoint_extensionless_path_roundtrip(tmp_path):
    """Regression: np.savez appends '.npz' to extensionless names, which
    used to leave '--checkpoint foo.ckpt' unreadable on resume."""
    import jax.numpy as jnp

    from sdrpp_tpu.utils.checkpoint import load_state, save_state

    p = tmp_path / "foo.ckpt"  # no .npz suffix
    state = {"a": jnp.arange(4.0), "b": jnp.zeros((2, 2))}
    save_state(str(p), state, stream_offset=77)
    assert p.exists()  # the EXACT requested path
    restored, off = load_state(str(p), state)
    assert off == 77
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.arange(4.0, dtype=np.float32))
