"""Misc modules: scanner, frequency manager, rigctl, meters, FMIF."""

import socket
import time

import numpy as np
import jax.numpy as jnp
import pytest

from sdrpp_tpu.misc.frequency_manager import FrequencyManager
from sdrpp_tpu.misc.meters import peak_level, vfo_signal_info
from sdrpp_tpu.misc.rigctl import RigctlServer
from sdrpp_tpu.misc.scanner import Scanner
from sdrpp_tpu.ops.fm_if import FMIFNoiseReduction
from sdrpp_tpu.utils.config import ConfigManager


def make_line(size, whole_bw, signals, noise_db=-80.0):
    """Synthetic centered dB FFT line with tone bumps."""
    line = np.full(size, noise_db, np.float32)
    for freq, level in signals:
        k = int(freq / (whole_bw / 2) * (size / 2) + size / 2)
        line[max(k - 2, 0): k + 3] = level
    return line


def test_vfo_signal_info():
    line = make_line(4096, 1000000.0, [(100000.0, -20.0)])
    strength, snr = vfo_signal_info(line, 100000.0, 12500.0, 1000000.0)
    assert abs(strength + 20.0) < 1.0
    assert 55.0 < snr < 65.0
    # Empty channel
    s2, snr2 = vfo_signal_info(line, -200000.0, 12500.0, 1000000.0)
    assert snr2 < 5.0


def test_peak_level():
    assert abs(peak_level(np.array([0.5, -1.0, 0.2])) - 0.0) < 1e-6
    assert peak_level(np.array([0.1])) < -19.9


def test_scanner_finds_and_lingers():
    wf_bw = 1000000.0
    sc = Scanner(-400000.0, 400000.0, interval=100000.0, level_db=-40.0,
                 tuning_time=0.0, linger_time=0.5)
    sc.current = -400000.0
    line = make_line(4096, wf_bw, [(200000.0, -20.0)])
    # Step until the scanner parks on the signal.
    now = 0.0
    for _ in range(20):
        f = sc.step(line, 12500.0, 0.0, wf_bw, now)
        now += 0.1
        if sc.receiving:
            break
    assert sc.receiving and abs(sc.current - 200000.0) < 1.0
    # Signal disappears -> linger, then resume scanning.
    quiet = make_line(4096, wf_bw, [])
    for _ in range(10):
        sc.step(quiet, 12500.0, 0.0, wf_bw, now)
        now += 0.1
    assert not sc.receiving


def test_frequency_manager(tmp_path):
    cfg = ConfigManager(tmp_path / "freqs.json")
    fm = FrequencyManager(cfg)
    fm.add("NOAA 15", 137620000.0, 40000.0, "nfm")
    fm.add("WWV", 10000000.0, 10000.0, "am")
    assert set(fm.bookmarks()) == {"NOAA 15", "WWV"}
    bm = fm.get("WWV")
    assert bm.frequency == 10000000.0 and bm.mode == "am"
    # persists across reload
    fm2 = FrequencyManager(ConfigManager(tmp_path / "freqs.json"))
    assert fm2.get("NOAA 15").bandwidth == 40000.0
    fm2.remove("WWV")
    assert "WWV" not in fm2.bookmarks()


class _Controller:
    def __init__(self):
        self.freq = 96000000.0
        self.mode = "wfm"
        self.pb = 200000.0
        self.running = False

    def get_freq(self):
        return self.freq

    def set_freq(self, f):
        self.freq = f

    def get_mode(self):
        return self.mode, self.pb

    def set_mode(self, m, pb):
        self.mode = m
        self.pb = pb if pb > 0 else self.pb

    def start(self):
        self.running = True

    def stop(self):
        self.running = False


def _send(sock, line):
    sock.sendall(line.encode() + b"\n")
    time.sleep(0.05)
    return sock.recv(4096).decode()


def test_rigctl_server():
    ctl = _Controller()
    srv = RigctlServer(ctl)
    s = socket.create_connection(("127.0.0.1", srv.port))
    try:
        assert _send(s, "F 145500000") == "RPRT 0\n"
        assert ctl.freq == 145500000.0
        assert _send(s, "f") == "145500000\n"
        assert _send(s, "M FM 12500") == "RPRT 0\n"
        assert ctl.mode == "nfm" and ctl.pb == 12500.0
        assert _send(s, "m") == "FM\n12500\n"
        assert _send(s, "\\chk_vfo") == "0\n"
        assert _send(s, "v") == "VFOA\n"
        assert _send(s, "\\start") == "RPRT 0\n"
        assert ctl.running
        assert _send(s, "XYZZY") == "RPRT -11\n"
        assert _send(s, "F notanumber") == "RPRT -1\n"
    finally:
        s.close()
        srv.close()


def test_fmif_passes_dominant_tone():
    fs = 48000.0
    n = 2048
    t = np.arange(n) / fs
    tone = np.exp(2j * np.pi * 6000.0 * t)
    rng = np.random.default_rng(0)
    noise = 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    x = (tone + noise).astype(np.complex64)
    nr = FMIFNoiseReduction(bins=32)
    st, y = nr(nr.init_state(), jnp.asarray(x))
    y = np.asarray(y)[64:]
    # Output should be dominated by the 6 kHz tone with reduced noise floor.
    spec = np.abs(np.fft.fft(y))
    freqs = np.fft.fftfreq(len(y), 1 / fs)
    k = np.argmax(spec)
    assert abs(freqs[k] - 6000.0) < 100.0
    inband = spec[np.abs(freqs - 6000.0) < 400].sum()
    out = spec.sum() - inband
    assert inband > 3 * out


def test_rigctl_client_against_server():
    from sdrpp_tpu.misc.rigctl import RigctlClient
    ctl = _Controller()
    srv = RigctlServer(ctl)
    cli = RigctlClient("127.0.0.1", srv.port)
    try:
        assert cli.set_freq(7074000)
        assert cli.get_freq() == 7074000.0
        assert cli.set_mode("USB", 2700)
        assert cli.get_mode() == ("USB", 2700.0)
    finally:
        cli.close()
        srv.close()


def test_scheduler_fires_in_order():
    from sdrpp_tpu.misc.scheduler import Scheduler, Task
    events = []
    s = Scheduler()
    s.add(Task("rec", 10.0, 20.0, on_start=lambda: events.append("rec+"),
               on_end=lambda: events.append("rec-")))
    s.add(Task("tune", 5.0, None, on_start=lambda: events.append("tune")))
    assert s.tick(1.0) == []
    assert s.tick(6.0) == ["start:tune"]
    assert s.tick(11.0) == ["start:rec"]
    assert s.tick(25.0) == ["end:rec"]
    assert events == ["tune", "rec+", "rec-"]
    assert len(s.tasks()) == 1  # the never-ending 'tune' task remains


def test_waterfall_display_traces_and_framebuffer():
    from sdrpp_tpu.misc.waterfall import WaterfallDisplay, make_palette

    wf = WaterfallDisplay(raw_fft_size=256, data_width=64,
                          waterfall_height=8, whole_bandwidth=100e3,
                          waterfall_min=-80.0, waterfall_max=0.0)
    line = np.full(256, -70.0, np.float32)
    line[128] = -10.0  # a carrier at DC

    out = wf.push_fft(line)
    assert out.shape == (64,)
    # zoom is a max-decimation: the carrier survives into its pixel
    assert out.max() == -10.0 and np.argmax(out) == 32
    # framebuffer scrolled: newest line at row 0, older rows zero-init
    assert wf.framebuffer[0].any()

    # smoothing: one-pole IIR from the -1000 floor upward
    wf.set_fft_smoothing(True)
    wf.set_fft_smoothing_speed(0.5)
    s1 = wf.push_fft(line).copy()
    s2 = wf.push_fft(line).copy()
    assert s1[0] == pytest.approx(0.5 * -70.0 + 0.5 * -1000.0)
    assert s2[0] == pytest.approx(0.5 * -70.0 + 0.5 * s1[0])

    # hold: decaying max; reference quirk keeps bin 0 frozen
    wf.set_fft_smoothing(False)
    wf.set_fft_hold(True)
    wf.set_fft_hold_speed(3.0)
    h1 = wf.push_fft(line).copy()
    quiet = np.full(256, -75.0, np.float32)
    wf.push_fft(quiet)
    assert wf.latest_fft_hold[32] == pytest.approx(-13.0)  # -10 decayed 3 dB
    assert wf.latest_fft_hold[0] == -1000.0  # bin-0 quirk (waterfall.cpp:953)

    # VFO metering with SNR smoothing + 10-deep level-max history
    wf.select_vfo(0.0, 10e3)
    wf.set_snr_smoothing(True)
    wf.set_snr_smoothing_speed(0.5)
    wf.push_fft(line)
    snr_a = wf.vfo_snr
    wf.push_fft(line)
    assert wf.vfo_level == pytest.approx(-10.0)
    assert wf.vfo_snr > snr_a  # smoothing ramps toward the true SNR
    assert wf.vfo_level_max == pytest.approx(-10.0)

    # palette LUT: endpoints match the colormap stops, ABGR packing
    pal = make_palette(resolution=1000)
    assert pal[0] == (255 << 24) | (0x20 << 16)  # dark blue, A|B|G|R
    assert pal.shape == (1000,)

    wf.auto_range()
    assert wf.waterfall_min == pytest.approx(wf.latest_fft.min() - 10.0)
    assert wf.waterfall_max == pytest.approx(wf.latest_fft.max() + 10.0)


def test_sink_manager_volume_power_law():
    """Volume applies gain = volume^2 (dsp/audio/volume.h:14-17)."""
    from sdrpp_tpu.io.sinks import BufferSink, SinkManager

    sm = SinkManager()
    buf = BufferSink()
    sm.register_stream("radio", 48000.0, provider=buf)
    sm.set_volume("radio", 0.5)
    sm.write("radio", np.ones(4, np.float32))
    np.testing.assert_allclose(buf.data()[-4:], 0.25)
    sm.set_muted("radio", True)
    sm.write("radio", np.ones(4, np.float32))
    np.testing.assert_allclose(buf.data()[-4:], 0.0)


def test_cli_auto_block_engages_loops():
    """cli run's default block sizing: the IF-rate block reaches the
    chunk-parallel engagement grain for every mode's rate ratio."""
    from sdrpp_tpu.cli import _auto_block
    from sdrpp_tpu.ops.scans_pallas import _chunk_lanes_for

    # AM at a 2.4 Msps RTL-style input: IF 24k is 100x decimated
    b = _auto_block(2400000.0, 24000.0, 512)
    assert b * 24000.0 / 2400000.0 >= 16384  # AGC (W=2048) engages
    assert _chunk_lanes_for(int(b * 24000.0 / 2400000.0), 2048, 512) >= 8
    # WFM at 960k: IF 240k
    b = _auto_block(960000.0, 240000.0, 4)
    assert _chunk_lanes_for(int(b * 240000.0 / 960000.0), 512, 512) >= 32
    # floor/ceiling respected
    assert _auto_block(48000.0, 48000.0, 2) == 262144
    assert _auto_block(100e6, 3000.0, 2) == 1 << 22
