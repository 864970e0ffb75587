"""Golden regression: deterministic chains vs checked-in outputs.

SURVEY §4(b) prescribes golden-file audio comparisons. Direct parity vs the
ACTUAL reference implementation is covered by tests/test_oracle_parity.py
(native/oracle compiles the unmodified reference DSP headers against scalar
volk/fftw shims); THESE goldens additionally freeze our own end-to-end
outputs so later optimization rounds can't silently drift
(tolerance 0.1 dB RMS, the BASELINE audio bound).

Regenerate intentionally with: python tests/test_golden.py --regen
"""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDEN = Path(__file__).parent / "data" / "golden_chains.npz"


def _am_chain_audio():
    from sdrpp_tpu.models.radio import RadioChannel
    fs, f_ch, f_aud = 96000.0, 20000.0, 1000.0
    chan = RadioChannel("am", fs, offset=f_ch, audio_rate=48000.0)
    n = chan.block_multiple * (96000 // chan.block_multiple)
    t = np.arange(n) / fs
    iq = (0.5 * (1 + 0.5 * np.sin(2 * np.pi * f_aud * t))
          * np.exp(2j * np.pi * f_ch * t)).astype(np.complex64)
    st, audio = jax.jit(chan)(chan.init_state(), jnp.asarray(iq))
    return np.asarray(audio)


def _wfm_chain_audio():
    from sdrpp_tpu.models.analog import WFMDemod
    fs, n, dev = 240000.0, 96000, 75000.0
    t = np.arange(n) / fs
    l = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    r = 0.5 * np.sin(2 * np.pi * 3000.0 * t)
    mpx = (0.45 * (l + r) + 0.1 * np.sin(2 * np.pi * 19000.0 * t)
           + 0.45 * (l - r) * np.sin(2 * np.pi * 38000.0 * t))
    iq = np.exp(1j * np.cumsum(2 * np.pi * dev * mpx / fs)).astype(np.complex64)
    d = WFMDemod(deviation=dev, samplerate=fs, stereo=True)
    st, y = jax.jit(d)(d.init_state(), jnp.asarray(iq))
    return np.asarray(y)


def _nfm_bank_audio():
    from sdrpp_tpu.parallel.vfo_bank import ScannerBank
    fs = 512000.0
    offs = np.array([-128000.0, 64000.0])
    bank = ScannerBank(offs, fs, mode="nfm", if_rate=32000.0, bandwidth=12500.0)
    n = bank.block_multiple * (65536 // bank.block_multiple)
    t = np.arange(n) / fs
    iq = (0.4 * np.exp(1j * (2 * np.pi * 64000.0 * t
                             + np.cumsum(2 * np.pi * 5000.0
                                         * np.sin(2 * np.pi * 700.0 * t) / fs)))
          ).astype(np.complex64)
    st, audio = jax.jit(bank)(bank.init_state(), jnp.asarray(iq))
    return np.asarray(audio)


CHAINS = {
    "am": _am_chain_audio,
    "wfm_stereo": _wfm_chain_audio,
    "nfm_bank": _nfm_bank_audio,
}


def _rms_db_diff(a, b):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    ref = np.sqrt(np.mean(np.asarray(b, np.float64) ** 2)) + 1e-30
    return 20 * np.log10(np.sqrt(np.mean(d ** 2)) / ref + 1e-30)


@pytest.mark.parametrize("name", list(CHAINS))
def test_golden_chain(name):
    assert GOLDEN.exists(), "run: python tests/test_golden.py --regen"
    want = np.load(GOLDEN)[name]
    got = CHAINS[name]()
    assert got.shape == want.shape
    # -40 dB RMS difference ~= identical to well below the 0.1 dB SNR bound.
    assert _rms_db_diff(got, want) < -40.0, _rms_db_diff(got, want)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    if "--regen" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        out = {name: fn() for name, fn in CHAINS.items()}
        GOLDEN.parent.mkdir(exist_ok=True)
        np.savez_compressed(GOLDEN, **out)
        print(f"regenerated {GOLDEN} with {list(out)}")
