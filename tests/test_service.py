"""Service layer: config manager, checkpoint/resume, CLI commands."""

import json
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from sdrpp_tpu.models.radio import RadioChannel
from sdrpp_tpu.utils.checkpoint import load_state, save_state
from sdrpp_tpu.utils.config import ConfigManager


def test_config_defaults_merge_and_save(tmp_path):
    p = tmp_path / "conf.json"
    c = ConfigManager(p, defaults={"fftSize": 65536, "radio": {"mode": "wfm"}})
    assert c.get("fftSize") == 65536
    assert p.exists()
    c.set("radio", "mode", "am")
    # Reload sees the persisted change + defaults for new keys.
    c2 = ConfigManager(p, defaults={"fftSize": 65536, "newKey": 1,
                                    "radio": {"mode": "wfm", "squelch": -50}})
    assert c2.get("radio", "mode") == "am"
    assert c2.get("newKey") == 1
    assert c2.get("radio", "squelch") == -50


def test_config_repair_on_corrupt(tmp_path):
    p = tmp_path / "conf.json"
    p.write_text("{not json!!")
    c = ConfigManager(p, defaults={"a": 1})
    assert c.get("a") == 1
    assert json.loads(p.read_text())["a"] == 1


def test_checkpoint_roundtrip(tmp_path):
    chan = RadioChannel("nfm", 96000.0, offset=10000.0)
    st = chan.init_state()
    # run a block so state is non-trivial
    n = chan.block_multiple * 16
    t = np.arange(n) / 96000.0
    iq = np.exp(2j * np.pi * 10000.0 * t).astype(np.complex64)
    st, _ = chan(st, jnp.asarray(iq))
    save_state(tmp_path / "ck.npz", st, stream_offset=n)
    st2, off = load_state(tmp_path / "ck.npz", chan.init_state())
    assert off == n
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_mismatch_rejected(tmp_path):
    chan = RadioChannel("nfm", 96000.0, offset=10000.0)
    save_state(tmp_path / "ck.npz", chan.init_state())
    other = RadioChannel("am", 96000.0, offset=0.0)
    with pytest.raises(ValueError):
        load_state(tmp_path / "ck.npz", other.init_state())


def _run_cli(args, cwd):
    env = dict(__import__("os").environ)
    env["JAX_PLATFORMS"] = "cpu"
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            "import sys; sys.path.insert(0, '%s');"
            "from sdrpp_tpu.cli import main; sys.exit(main(%r) or 0)"
            % (str(cwd), args))
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=300)


@pytest.fixture(scope="module")
def repo_root():
    from pathlib import Path
    return Path(__file__).resolve().parent.parent


def test_cli_run_on_file(tmp_path, repo_root):
    # Make a small AM capture
    from sdrpp_tpu.io import wav
    fs = 96000.0
    n = 96000
    t = np.arange(n) / fs
    iq = (0.5 * (1 + 0.5 * np.sin(2 * np.pi * 1000.0 * t))
          * np.exp(2j * np.pi * 20000.0 * t)).astype(np.complex64)
    cap = tmp_path / "cap.wav"
    wav.write_wav(cap, int(fs), np.stack([iq.real, iq.imag], -1), "i16")
    out = tmp_path / "audio.wav"
    r = _run_cli(["run", "--source", str(cap), "--mode", "am",
                  "--offset", "20000", "--block-size", "32768",
                  "--out", str(out)], repo_root)
    assert r.returncode == 0, r.stderr
    info, audio = wav.read_wav(out)
    assert info.samplerate == 48000 and len(audio) > 0


def test_cli_spectrum(tmp_path, repo_root):
    out = tmp_path / "wf.npy"
    r = _run_cli(["spectrum", "--source", "test:1000000", "--fft-size", "4096",
                  "--fft-rate", "30", "--blocks", "2",
                  "--block-size", "131072", "--out", str(out)], repo_root)
    assert r.returncode == 0, r.stderr
    wf = np.load(out)
    assert wf.ndim == 2 and wf.shape[1] == 4096
    # test source default tone at +100 kHz
    peak = np.argmax(wf[-1])
    assert abs(peak - (2048 + int(100000.0 / 1000000.0 * 4096))) <= 2
