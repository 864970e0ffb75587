"""Differential parity vs the ACTUAL reference implementation.

SURVEY §4's gap analysis prescribed golden-file parity with the reference;
BASELINE.md bounds demod audio at 0.1 dB. The reference's DSP core is
header-only C++17 whose only external deps are VOLK/FFTW3 scalar kernels —
native/oracle/ compiles the UNMODIFIED reference headers (read-only tree at
/root/reference) against original scalar shims and exposes each block as a
CLI (`oracle <chain> <in.f32> <out.f32> <blockSize> params...`) that is
driven chunk-by-chunk exactly like sdrpp_tpu carries state across blocks.

Each test feeds the SAME IQ to the reference binary and to our block and
compares:
  * err_snr: 20·log10(rms(ref)/rms(ref−ours)) — how far below the reference
    signal our deviation sits (60 dB ≈ float32-roundoff-limited for LTI
    blocks; sequential loops accumulate divergence, bounded looser).
  * level: |20·log10(rms(ours)/rms(ref))| ≤ 0.1 dB — the BASELINE bound.

If g++ or the reference tree is unavailable the module skips.
"""

from pathlib import Path
import subprocess

import numpy as np
import jax
import jax.numpy as jnp
import pytest

ROOT = Path(__file__).resolve().parent.parent
ORACLE = ROOT / "native" / "oracle" / "oracle"
REF = Path("/root/reference")


@pytest.fixture(scope="module")
def oracle():
    if not REF.exists():
        pytest.skip("reference tree not mounted")
    if not ORACLE.exists():
        r = subprocess.run(["make", "-C", str(ORACLE.parent)],
                           capture_output=True, text=True)
        if r.returncode != 0 or not ORACLE.exists():
            pytest.skip(f"oracle build failed: {r.stderr[-500:]}")
    return ORACLE


def run_oracle(oracle, tmp_path, chain, x, *params, block=8192):
    fi = tmp_path / "in.bin"
    fo = tmp_path / "out.bin"
    if np.iscomplexobj(x):
        np.ascontiguousarray(x.astype(np.complex64)).view(np.float32).tofile(fi)
    else:
        np.ascontiguousarray(x.astype(np.float32)).tofile(fi)
    subprocess.run([str(oracle), chain, str(fi), str(fo), str(block)]
                   + [repr(float(p)) for p in params], check=True,
                   capture_output=True)
    return np.fromfile(fo, np.float32)


def run_ours(blk, x, block=8192):
    f = jax.jit(blk)
    st = blk.init_state()
    outs = []
    for i in range(0, len(x), block):
        st, y = f(st, jnp.asarray(x[i:i + block]))
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1 if outs[0].ndim <= 1 else 0) \
        if outs[0].ndim <= 1 else np.concatenate(outs, axis=0)


def err_snr_db(ref, mine, skip=0):
    ref = ref[skip:]
    mine = mine[skip:]
    n = min(len(ref), len(mine))
    ref, mine = ref[:n], mine[:n]
    num = np.sqrt(np.mean(np.abs(ref) ** 2))
    den = np.sqrt(np.mean(np.abs(ref - mine) ** 2)) + 1e-30
    return 20.0 * np.log10(num / den + 1e-30)


def level_diff_db(ref, mine, skip=0):
    ref = ref[skip:]
    mine = mine[skip:]
    n = min(len(ref), len(mine))
    r = np.sqrt(np.mean(np.abs(ref[:n]) ** 2)) + 1e-30
    m = np.sqrt(np.mean(np.abs(mine[:n]) ** 2)) + 1e-30
    return abs(20.0 * np.log10(m / r))


def _iq(n, seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    return ((rng.standard_normal(n) + 1j * rng.standard_normal(n))
            * scale).astype(np.complex64)


def _fm_iq(n, fs, dev, f_audio=1000.0, scale=0.8):
    t = np.arange(n) / fs
    audio = np.sin(2 * np.pi * f_audio * t)
    phase = np.cumsum(2 * np.pi * dev * audio / fs)
    return (scale * np.exp(1j * phase)).astype(np.complex64)


# ---------- design-data parity (bit-exact) ----------

def test_taps_lowpass_exact(oracle, tmp_path):
    from sdrpp_tpu.ops import taps
    ref = run_oracle(oracle, tmp_path, "taps_lowpass", np.zeros(1, np.float32),
                     4000.0, 800.0, 48000.0)
    mine = taps.low_pass(4000.0, 800.0, 48000.0)
    assert len(ref) == len(mine)
    np.testing.assert_array_equal(mine.astype(np.float32), ref)


def test_taps_bandpass_complex_exact(oracle, tmp_path):
    from sdrpp_tpu.ops import taps
    ref = run_oracle(oracle, tmp_path, "taps_bandpass_c64", np.zeros(1, np.float32),
                     18750.0, 19250.0, 3000.0, 240000.0).view(np.complex64)
    mine = taps.band_pass(18750.0, 19250.0, 3000.0, 240000.0, complex_taps=True)
    assert len(ref) == len(mine)
    np.testing.assert_allclose(mine.astype(np.complex64), ref, atol=1e-7)


def test_taps_rrc_exact(oracle, tmp_path):
    from sdrpp_tpu.ops import taps
    ref = run_oracle(oracle, tmp_path, "taps_rrc", np.zeros(1, np.float32),
                     31.0, 0.35, 72000.0, 150000.0)
    mine = taps.root_raised_cosine_rate(31, 0.35, 72000.0, 150000.0)
    np.testing.assert_allclose(mine.astype(np.float32), ref, atol=1e-6)


@pytest.mark.parametrize("wid,kind", [
    (0, "rectangular"), (1, "hamming"), (2, "hann"), (3, "blackman"),
    (4, "nuttall"), (5, "blackman_harris4"), (6, "blackman_harris7"),
])
@pytest.mark.parametrize("centered", [0, 1])
def test_windows_exact(oracle, tmp_path, wid, kind, centered):
    from sdrpp_tpu.ops.windows import Window, create_window
    ref = run_oracle(oracle, tmp_path, "window", np.zeros(1, np.float32),
                     wid, 512, centered)
    mine = np.asarray(create_window(Window(kind), 512, centered=bool(centered)))
    np.testing.assert_allclose(mine, ref, atol=2e-7, rtol=1e-5)


# ---------- LTI / elementwise kernels (float-roundoff bound) ----------

def test_xlator(oracle, tmp_path):
    from sdrpp_tpu.ops.mix import FrequencyXlator
    iq = _iq(65536)
    ref = run_oracle(oracle, tmp_path, "xlator", iq, 12345.0, 250000.0).view(np.complex64)
    mine = run_ours(FrequencyXlator(12345.0, 250000.0), iq)
    assert err_snr_db(ref, mine) > 55.0
    assert level_diff_db(ref, mine) < 0.1


def test_fir_lowpass(oracle, tmp_path):
    from sdrpp_tpu.ops.fir import FIR
    from sdrpp_tpu.ops import taps
    iq = _iq(65536, seed=1)
    ref = run_oracle(oracle, tmp_path, "fir", iq, 4000.0, 800.0, 48000.0).view(np.complex64)
    mine = run_ours(FIR(taps.low_pass(4000.0, 800.0, 48000.0)), iq)
    assert err_snr_db(ref, mine) > 60.0
    assert level_diff_db(ref, mine) < 0.1


def test_decimating_fir(oracle, tmp_path):
    from sdrpp_tpu.ops.fir import DecimatingFIR
    from sdrpp_tpu.ops import taps
    iq = _iq(65536, seed=2)
    ref = run_oracle(oracle, tmp_path, "decim_fir", iq,
                     4.0, 5000.0, 1000.0, 48000.0).view(np.complex64)
    mine = run_ours(DecimatingFIR(taps.low_pass(5000.0, 1000.0, 48000.0), 4), iq)
    assert err_snr_db(ref, mine) > 60.0


def test_power_decimator(oracle, tmp_path):
    from sdrpp_tpu.ops.resample import PowerDecimator
    iq = _iq(65536, seed=3)
    ref = run_oracle(oracle, tmp_path, "power_decim", iq, 16.0).view(np.complex64)
    mine = run_ours(PowerDecimator(16), iq)
    assert err_snr_db(ref, mine) > 60.0


def test_rational_resampler(oracle, tmp_path):
    from sdrpp_tpu.ops.resample import RationalResampler
    iq = _iq(80000, seed=4)
    ref = run_oracle(oracle, tmp_path, "resamp", iq, 240000.0, 48000.0,
                     block=8000).view(np.complex64)
    mine = run_ours(RationalResampler(240000.0, 48000.0), iq, block=8000)
    assert err_snr_db(ref, mine) > 55.0
    assert level_diff_db(ref, mine) < 0.1


def test_quadrature(oracle, tmp_path):
    # skip=1: the reference Quadrature's first output sample is undefined —
    # quadrature.h:7 enables the `_din` carry variant but `complex_t _din`
    # (quadrature.h:86) is never initialized (init() doesn't call reset()),
    # so out[0] reads uninitialized memory. We define the carry as 0.
    from sdrpp_tpu.ops.fm import Quadrature
    iq = _fm_iq(65536, 48000.0, 2500.0)
    ref = run_oracle(oracle, tmp_path, "quadrature", iq, 5000.0, 48000.0)
    mine = run_ours(Quadrature(5000.0, 48000.0), iq)
    assert err_snr_db(ref, mine, skip=1) > 60.0


def test_deemphasis(oracle, tmp_path):
    from sdrpp_tpu.ops.scans import Deemphasis
    rng = np.random.default_rng(5)
    x = rng.standard_normal(65536).astype(np.float32)
    ref = run_oracle(oracle, tmp_path, "deemphasis", x, 50e-6, 48000.0)
    mine = run_ours(Deemphasis(50e-6, 48000.0), x)
    assert err_snr_db(ref, mine) > 60.0


def test_dc_blocker(oracle, tmp_path):
    from sdrpp_tpu.ops.scans import DCBlocker
    iq = _iq(65536, seed=6) + np.complex64(0.25 - 0.1j)
    ref = run_oracle(oracle, tmp_path, "dcblocker", iq, 0.001).view(np.complex64)
    mine = run_ours(DCBlocker(0.001), iq)
    assert err_snr_db(ref, mine) > 55.0


# ---------- sequential loops ----------

def test_agc_float(oracle, tmp_path):
    from sdrpp_tpu.ops.scans import AGC
    fs = 48000.0
    t = np.arange(65536) / fs
    env = 0.2 + 0.8 * (1 + np.sin(2 * np.pi * 0.5 * t)) / 2
    x = (env * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    args = (1.0, 50.0 / fs, 5.0 / fs, 10e6, 10.0, 1.0)
    ref = run_oracle(oracle, tmp_path, "agc", x, *args)
    mine = run_ours(AGC(*args), x)
    assert err_snr_db(ref, mine) > 40.0
    assert level_diff_db(ref, mine) < 0.1


def test_fast_agc_complex(oracle, tmp_path):
    from sdrpp_tpu.ops.scans import FastAGC
    iq = _iq(65536, seed=7, scale=0.1)
    args = (1.0, 1e4, 1e-4, 1.0)
    ref = run_oracle(oracle, tmp_path, "fastagc", iq, *args).view(np.complex64)
    mine = run_ours(FastAGC(*args), iq)
    assert err_snr_db(ref, mine) > 40.0
    assert level_diff_db(ref, mine) < 0.1


def test_pll(oracle, tmp_path):
    from sdrpp_tpu.ops.scans import PLL
    fs = 48000.0
    n = 65536
    t = np.arange(n) / fs
    iq = np.exp(1j * (2 * np.pi * 100.0 * t + 0.3)).astype(np.complex64)
    bw = 0.01
    ref = run_oracle(oracle, tmp_path, "pll", iq, bw).view(np.complex64)
    mine = run_ours(PLL(bw), iq)
    # Transient converges identically; compare the locked region.
    assert err_snr_db(ref, mine, skip=8192) > 35.0


def test_costas2(oracle, tmp_path):
    from sdrpp_tpu.ops.scans import Costas
    rng = np.random.default_rng(8)
    n = 65536
    bits = rng.integers(0, 2, n // 16) * 2 - 1
    bb = np.repeat(bits, 16).astype(np.float32)
    t = np.arange(n)
    iq = (bb * np.exp(1j * (2 * np.pi * 0.001 * t + 0.2))).astype(np.complex64)
    ref = run_oracle(oracle, tmp_path, "costas2", iq, 0.01).view(np.complex64)
    mine = run_ours(Costas(2, 0.01), iq)
    assert err_snr_db(ref, mine, skip=8192) > 30.0


def test_squelch_open_and_closed(oracle, tmp_path):
    from sdrpp_tpu.ops.scans import Squelch
    strong = _iq(32768, seed=9, scale=0.5)
    ref = run_oracle(oracle, tmp_path, "squelch", strong, -50.0,
                     block=4096).view(np.complex64)
    mine = run_ours(Squelch(-50.0), strong, block=4096)
    np.testing.assert_allclose(mine, ref, atol=1e-6)

    weak = _iq(32768, seed=10, scale=1e-5)
    ref = run_oracle(oracle, tmp_path, "squelch", weak, -50.0,
                     block=4096).view(np.complex64)
    mine = run_ours(Squelch(-50.0), weak, block=4096)
    np.testing.assert_allclose(mine, ref, atol=1e-7)


def test_noise_blanker(oracle, tmp_path):
    from sdrpp_tpu.ops.scans import NoiseBlanker
    iq = _iq(65536, seed=11, scale=0.1)
    iq[::1000] *= 50.0  # impulse noise
    ref = run_oracle(oracle, tmp_path, "noiseblanker", iq, 1e-4, 1.0).view(np.complex64)
    mine = run_ours(NoiseBlanker(1e-4, 1.0), iq)
    assert err_snr_db(ref, mine) > 40.0


def test_fmif_noise_reduction(oracle, tmp_path):
    from sdrpp_tpu.ops.fm_if import FMIFNoiseReduction
    iq = _fm_iq(16384, 48000.0, 2500.0) + _iq(16384, seed=12, scale=0.05)
    ref = run_oracle(oracle, tmp_path, "fmif", iq, 32.0, block=4096).view(np.complex64)
    mine = run_ours(FMIFNoiseReduction(32), iq, block=4096)
    assert err_snr_db(ref, mine) > 45.0


def test_mm_clock_recovery(oracle, tmp_path):
    from sdrpp_tpu.ops.clock_recovery import MMClockRecovery
    from sdrpp_tpu.ops import taps as taps_mod
    rng = np.random.default_rng(13)
    sps = 8
    nsym = 4096
    syms = ((rng.integers(0, 2, nsym) * 2 - 1)
            + 1j * (rng.integers(0, 2, nsym) * 2 - 1)).astype(np.complex64)
    ups = np.zeros(nsym * sps, np.complex64)
    ups[::sps] = syms
    rrc = taps_mod.root_raised_cosine_rate(8 * sps + 1, 0.35, 1.0, sps)
    iq = np.convolve(ups, rrc, mode="same").astype(np.complex64)

    args = (float(sps), 1e-6, 0.01, 0.01)
    ref = run_oracle(oracle, tmp_path, "mm", iq, *args, block=8192).view(np.complex64)

    mm = MMClockRecovery(*args)
    f = jax.jit(mm)
    st = mm.init_state()
    outs = []
    for i in range(0, len(iq), 8192):
        st, (symbols, valid) = f(st, jnp.asarray(iq[i:i + 8192]))
        outs.append(np.asarray(symbols)[np.asarray(valid)])
    mine = np.concatenate(outs)
    n = min(len(ref), len(mine))
    assert abs(len(ref) - len(mine)) <= 2
    assert err_snr_db(ref[: n], mine[: n]) > 25.0


# ---------- full demodulators (the BASELINE 0.1 dB audio bound) ----------

def _am_iq(n, fs, f_ch, f_aud, depth=0.5):
    t = np.arange(n) / fs
    return (0.5 * (1 + depth * np.sin(2 * np.pi * f_aud * t))
            * np.exp(2j * np.pi * f_ch * t)).astype(np.complex64)


@pytest.mark.parametrize("mode,modeval", [("carrier", 1), ("audio", 2)])
def test_am_demod(oracle, tmp_path, mode, modeval):
    from sdrpp_tpu.models.analog import AMDemod
    fs = 24000.0
    iq = _am_iq(65536, fs, 0.0, 1000.0)
    ref = run_oracle(oracle, tmp_path, "am", iq, modeval, 12000.0,
                     50.0 / fs, 5.0 / fs, 100.0 / fs, fs)
    mine = run_ours(AMDemod(12000.0, fs, agc_mode=mode), iq)
    assert err_snr_db(ref, mine, skip=8192) > 40.0
    assert level_diff_db(ref, mine, skip=8192) < 0.1


@pytest.mark.parametrize("mode,modeval", [("usb", 0), ("lsb", 1), ("dsb", 2)])
def test_ssb_demod(oracle, tmp_path, mode, modeval):
    from sdrpp_tpu.models.analog import SSBDemod
    fs = 48000.0
    n = 65536
    t = np.arange(n) / fs
    # two-tone voice-band signal offset into the selected sideband
    base = (0.3 * np.exp(2j * np.pi * 700.0 * t)
            + 0.2 * np.exp(2j * np.pi * 1900.0 * t))
    sign = {"usb": 1.0, "lsb": -1.0, "dsb": 1.0}[mode]
    iq = (base * np.exp(sign * 1j * 2 * np.pi * 0.0 * t)).astype(np.complex64)
    ref = run_oracle(oracle, tmp_path, "ssb", iq, modeval, 2700.0, fs,
                     1.0, 50.0 / fs, 5.0 / fs)
    mine = run_ours(SSBDemod(mode, 2700.0, fs), iq)
    assert err_snr_db(ref, mine, skip=8192) > 40.0
    assert level_diff_db(ref, mine, skip=8192) < 0.1


def test_cw_demod(oracle, tmp_path):
    from sdrpp_tpu.models.analog import CWDemod
    fs = 3000.0
    n = 30000
    t = np.arange(n) / fs
    iq = (0.4 * np.exp(2j * np.pi * 0.0 * t)).astype(np.complex64)
    keying = (np.sin(2 * np.pi * 2.0 * t) > 0).astype(np.float32)
    iq = (iq * keying).astype(np.complex64)
    ref = run_oracle(oracle, tmp_path, "cw", iq, 800.0, 1.0,
                     100.0 / fs, 5.0 / fs, fs, block=3000)
    mine = run_ours(CWDemod(800.0, fs), iq, block=3000)
    assert err_snr_db(ref, mine, skip=3000) > 35.0
    assert level_diff_db(ref, mine, skip=3000) < 0.1


def test_nfm_demod(oracle, tmp_path):
    from sdrpp_tpu.models.analog import NFMDemod
    fs = 48000.0
    iq = _fm_iq(65536, fs, 2500.0, f_audio=700.0)
    ref = run_oracle(oracle, tmp_path, "nfm", iq, fs, 12500.0, 1.0, 0.0)
    mine = run_ours(NFMDemod(12500.0, fs, low_pass=True, high_pass=False), iq)
    # skip the FIR length: the garbage first Quadrature sample (see
    # test_quadrature) rings through the reference's 291-tap audio LPF.
    assert err_snr_db(ref, mine, skip=300) > 50.0
    assert level_diff_db(ref, mine, skip=300) < 0.1


def test_wfm_stereo_demod(oracle, tmp_path):
    from sdrpp_tpu.models.analog import WFMDemod
    fs, dev, n = 240000.0, 75000.0, 240000
    t = np.arange(n) / fs
    l = 0.4 * np.sin(2 * np.pi * 1000.0 * t)
    r = 0.4 * np.sin(2 * np.pi * 3000.0 * t)
    mpx = (0.45 * (l + r) + 0.1 * np.sin(2 * np.pi * 19000.0 * t)
           + 0.45 * (l - r) * np.sin(2 * np.pi * 38000.0 * t))
    iq = np.exp(1j * np.cumsum(2 * np.pi * dev * mpx / fs)).astype(np.complex64)

    ref = run_oracle(oracle, tmp_path, "wfm", iq, dev, fs, 1.0, 1.0)
    ref_lr = ref.reshape(-1, 2)

    d = WFMDemod(deviation=dev, samplerate=fs, stereo=True, low_pass=True)
    f = jax.jit(d)
    st = d.init_state()
    outs = []
    for i in range(0, n, 8192):
        st, y = f(st, jnp.asarray(iq[i:i + 8192]))
        outs.append(np.asarray(y))
    mine_lr = np.concatenate(outs, axis=0)

    skip = 48000  # PLL lock + filter transients
    for ch in range(2):
        assert err_snr_db(ref_lr[:, ch], mine_lr[:, ch], skip=skip) > 35.0
        assert level_diff_db(ref_lr[:, ch], mine_lr[:, ch], skip=skip) < 0.1


def test_rx_vfo(oracle, tmp_path):
    from sdrpp_tpu.models.channel import RxVFO
    iq = _iq(96000, seed=14)
    args = (960000.0, 240000.0, 150000.0, 100000.0)
    ref = run_oracle(oracle, tmp_path, "rx_vfo", iq, *args,
                     block=8000).view(np.complex64)
    mine = run_ours(RxVFO(*args), iq, block=8000)
    assert err_snr_db(ref, mine) > 50.0
    assert level_diff_db(ref, mine) < 0.1


# ---------- extended coverage: higher-order loops, float paths, RDS tap ----------

@pytest.mark.parametrize("order", [4, 8])
def test_costas_higher_order(oracle, tmp_path, order):
    from sdrpp_tpu.ops.scans import Costas
    rng = np.random.default_rng(20 + order)
    n = 65536
    sym = rng.integers(0, order, n // 16)
    ph = 2 * np.pi * sym / order + (np.pi / order if order == 4 else 0.0)
    bb = np.repeat(np.exp(1j * ph), 16)
    t = np.arange(n)
    iq = (bb * np.exp(1j * (2 * np.pi * 0.0005 * t + 0.1))).astype(np.complex64)
    ref = run_oracle(oracle, tmp_path, f"costas{order}", iq, 0.01).view(np.complex64)
    mine = run_ours(Costas(order, 0.01), iq)
    assert err_snr_db(ref, mine, skip=8192) > 30.0


def test_agc_complex(oracle, tmp_path):
    from sdrpp_tpu.ops.scans import AGC
    fs = 48000.0
    t = np.arange(65536) / fs
    env = (0.05 + 0.5 * (1 + np.sin(2 * np.pi * 0.7 * t)) / 2).astype(np.float32)
    iq = (env * np.exp(2j * np.pi * 1000.0 * t)).astype(np.complex64)
    args = (1.0, 50.0 / fs, 5.0 / fs, 10e6, 10.0, 1.0)
    ref = run_oracle(oracle, tmp_path, "agc_c64", iq, *args).view(np.complex64)
    mine = run_ours(AGC(*args), iq)
    assert err_snr_db(ref, mine) > 40.0
    assert level_diff_db(ref, mine) < 0.1


def test_rational_resampler_float(oracle, tmp_path):
    # the AF-chain path: float audio 240k -> 48k
    from sdrpp_tpu.ops.resample import RationalResampler
    rng = np.random.default_rng(21)
    x = rng.standard_normal(80000).astype(np.float32)
    ref = run_oracle(oracle, tmp_path, "resamp_f32", x, 240000.0, 48000.0, block=8000)
    mine = run_ours(RationalResampler(240000.0, 48000.0, dtype=jnp.float32), x,
                    block=8000)
    assert err_snr_db(ref, mine) > 55.0
    assert level_diff_db(ref, mine) < 0.1


def test_deemphasis_stereo(oracle, tmp_path):
    from sdrpp_tpu.ops.scans import Deemphasis
    rng = np.random.default_rng(22)
    lr = rng.standard_normal((32768, 2)).astype(np.float32)
    ref = run_oracle(oracle, tmp_path, "deemphasis_stereo", lr.reshape(-1),
                     75e-6, 48000.0).reshape(-1, 2)
    blk = Deemphasis(75e-6, 48000.0, stereo=True)
    f = jax.jit(blk)
    st = blk.init_state()
    outs = []
    for i in range(0, len(lr), 8192):
        st, y = f(st, jnp.asarray(lr[i:i + 8192]))
        outs.append(np.asarray(y))
    mine = np.concatenate(outs, axis=0)
    for ch in range(2):
        assert err_snr_db(ref[:, ch], mine[:, ch]) > 55.0


def test_mm_clock_recovery_float(oracle, tmp_path):
    from sdrpp_tpu.ops.clock_recovery import MMClockRecovery
    from sdrpp_tpu.ops import taps as taps_mod
    rng = np.random.default_rng(23)
    sps = 10
    nsym = 3000
    bits = (rng.integers(0, 2, nsym) * 2 - 1).astype(np.float32)
    ups = np.zeros(nsym * sps, np.float32)
    ups[::sps] = bits
    rrc = taps_mod.root_raised_cosine_rate(8 * sps + 1, 0.35, 1.0, sps)
    x = np.convolve(ups, rrc, mode="same").astype(np.float32)

    args = (float(sps), 1e-6, 0.01, 0.01)
    ref = run_oracle(oracle, tmp_path, "mm_f32", x, *args, block=6000)

    mm = MMClockRecovery(*args, complex_input=False)
    f = jax.jit(mm)
    st = mm.init_state()
    outs = []
    for i in range(0, len(x), 6000):
        st, (symbols, valid) = f(st, jnp.asarray(x[i:i + 6000]))
        outs.append(np.asarray(symbols)[np.asarray(valid)])
    mine = np.concatenate(outs)
    n = min(len(ref), len(mine))
    assert abs(len(ref) - len(mine)) <= 2
    assert err_snr_db(ref[:n], mine[:n]) > 25.0


def test_wfm_rds_tap(oracle, tmp_path):
    from sdrpp_tpu.models.analog import WFMDemod
    fs, dev, n = 240000.0, 75000.0, 240000
    t = np.arange(n) / fs
    rng = np.random.default_rng(24)
    # RDS-band content: BPSK-ish tone cluster at 57 kHz on the MPX
    bits = np.repeat(rng.integers(0, 2, n // 101 + 2) * 2.0 - 1.0, 101)[:n]
    mpx = (0.4 * np.sin(2 * np.pi * 1000.0 * t)
           + 0.1 * np.sin(2 * np.pi * 19000.0 * t)
           + 0.06 * bits * np.sin(2 * np.pi * 57000.0 * t))
    iq = np.exp(1j * np.cumsum(2 * np.pi * dev * mpx / fs)).astype(np.complex64)

    ref = run_oracle(oracle, tmp_path, "wfm_rds", iq, dev, fs, 1.0, 1.0,
                     block=9600).view(np.complex64)

    d = WFMDemod(deviation=dev, samplerate=fs, stereo=True, low_pass=True,
                 rds_out=True)
    f = jax.jit(d)
    st = d.init_state()
    outs = []
    for i in range(0, n, 9600):
        st, (_audio, rds) = f(st, jnp.asarray(iq[i:i + 9600]))
        outs.append(np.asarray(rds))
    mine = np.concatenate(outs)
    assert err_snr_db(ref, mine, skip=1000) > 35.0
    assert level_diff_db(ref, mine, skip=1000) < 0.1


def test_golden_e2e_wav_to_audio_at_rtl_rate(oracle, tmp_path):
    """VERDICT #9 golden end-to-end: one IQ WAV at an RTL-style rate
    (2.4 Msps) driven through (a) the reference oracle's FULL chain —
    RxVFO 2.4M->48k (power-decim cascade + gcd rational resampler plan,
    rational_resampler.h:121-167) feeding the FM demod — and (b) our
    public `cli run` entry point, asserting audio parity within 0.1 dB.
    """
    import wave as wave_mod

    from sdrpp_tpu.cli import cmd_run
    from sdrpp_tpu.io import wav as wav_io

    fs, off, f_aud, dev, bw = 2400000.0, 300000.0, 1000.0, 2500.0, 12500.0
    n = 1200000  # 0.5 s
    t = np.arange(n) / fs
    audio = np.sin(2 * np.pi * f_aud * t)
    iq = np.exp(1j * (2 * np.pi * off * t
                      + np.cumsum(2 * np.pi * dev * audio / fs))
                ).astype(np.complex64)

    # (a) reference chain: RxVFO (2.4M -> 48k IF, 12.5k channel) -> NFM
    ref_if = run_oracle(oracle, tmp_path, "rx_vfo", iq,
                        2400000.0, 48000.0, 12500.0, off,
                        block=240000).view(np.complex64)
    ref = run_oracle(oracle, tmp_path, "nfm", ref_if,
                     48000.0, bw, 1.0, 0.0, block=6000)

    # (b) our full app path: IQ WAV file -> cli run -> audio WAV
    src_wav = tmp_path / "iq2400k.wav"
    wav_io.write_wav(str(src_wav), int(fs),
                     np.stack([iq.real, iq.imag], -1), "f32")
    out_wav = tmp_path / "audio.wav"
    cmd_run(["--source", str(src_wav), "--mode", "nfm",
             "--offset", str(off), "--out", str(out_wav),
             "--sample-format", "i16", "--block-size", "240000"])
    with wave_mod.open(str(out_wav), "rb") as w:
        assert w.getframerate() == 48000 and w.getnchannels() == 1
        mine = np.frombuffer(w.readframes(w.getnframes()), np.int16) \
            .astype(np.float32) / 32767.0

    # parity within 0.1 dB after the acquisition/filter transient
    skip = 4800
    m = min(len(ref), len(mine))
    assert m > 20000, (len(ref), len(mine))
    snr = err_snr_db(ref[:m], mine[:m], skip=skip)
    lvl = level_diff_db(ref[:m], mine[:m], skip=skip)
    assert snr > 40.0, snr
    assert lvl < 0.1, lvl
    # and the recovered tone is the right one
    seg = mine[skip:m].astype(np.float64)
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f_pk = np.argmax(spec[5:]) + 5
    assert abs(f_pk * 48000.0 / len(seg) - f_aud) < 5.0
