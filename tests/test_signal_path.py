"""IQFrontEnd / SpectrumFFT / Receiver orchestration tests."""

import numpy as np
import jax
import jax.numpy as jnp

from sdrpp_tpu.io.sinks import BufferSink
from sdrpp_tpu.io.sources import TestSource, detect_center_freq
from sdrpp_tpu.ops.spectrum import SpectrumFFT, fft_zoom, gen_reshape_params
from sdrpp_tpu.ops.windows import Window
from sdrpp_tpu.receiver import Receiver
from sdrpp_tpu.signal_path import IQFrontEnd


def test_gen_reshape_params():
    # fs=1e6, size=65536, rate=20 -> interval 50000 < size: nz=50000, skip=0
    skip, nz = gen_reshape_params(1e6, 65536, 20.0)
    assert nz == 50000 and skip == 0
    # rate=10 -> interval 100000 > size: nz=65536, skip=34464
    skip, nz = gen_reshape_params(1e6, 65536, 10.0)
    assert nz == 65536 and skip == 100000 - 65536


def test_spectrum_tone_magnitude_and_center():
    fs = 100000.0
    size = 4096
    spec = SpectrumFFT(size, fs, fs / size, Window.NUTTALL)
    assert spec.frame_len == size and spec.nz == size
    n = size * 4
    t = np.arange(n) / fs
    # Full-scale tone at +12.5 kHz
    x = np.exp(2j * np.pi * 12500.0 * t).astype(np.complex64)
    lines = np.asarray(spec(jnp.asarray(x)))
    assert lines.shape == (4, size)
    line = lines[2]
    # Centered output: DC at bin size/2; +12.5k at size/2 + 12500/fs*size
    peak_bin = np.argmax(line)
    want_bin = size // 2 + int(12500.0 / fs * size)
    assert abs(peak_bin - want_bin) <= 1
    # Unity-gain window: full-scale tone peaks at ~0 dB
    assert abs(line[peak_bin]) < 0.5, line[peak_bin]


def test_spectrum_zero_padding_path():
    fs = 100000.0
    size = 8192
    spec = SpectrumFFT(size, fs, 25.0, Window.NUTTALL)  # interval 4000 < size
    assert spec.nz == 4000 and spec.skip == 0
    x = np.exp(2j * np.pi * 10000.0 * np.arange(8000) / fs).astype(np.complex64)
    lines = np.asarray(spec(jnp.asarray(x)))
    assert lines.shape == (2, size)
    peak = np.argmax(lines[1])
    want = size // 2 + int(10000.0 / fs * size)
    assert abs(peak - want) <= 2


def test_fft_zoom():
    line = jnp.asarray(np.arange(1024, dtype=np.float32))
    z = np.asarray(fft_zoom(line, 256, 512, 128))
    assert z.shape == (128,)
    # max-decimation: each output = max of its 4-bin span
    np.testing.assert_array_equal(z, 256 + np.arange(128) * 4 + 3)


def test_frontend_decim_and_fft():
    fs = 200000.0
    fe = IQFrontEnd(fs, decim_ratio=4, fft_size=1024,
                    fft_rate=50000.0 / 1024, block_size=40960)
    n = 40960
    t = np.arange(n) / fs
    x = (np.exp(2j * np.pi * 5000.0 * t) + 0.3).astype(np.complex64)
    st, (iq, fft) = jax.jit(fe)(fe.init_state(), jnp.asarray(x))
    assert iq.shape == (n // 4,)
    assert fft.shape[1] == 1024
    # DC blocker: the 0.3 DC offset should be attenuated over the block.
    assert abs(np.mean(np.asarray(iq)[-1000:])) < 0.1


def test_frontend_invert_iq():
    fe = IQFrontEnd(100000.0, dc_blocking=False, invert_iq=True,
                    fft_size=256, fft_rate=100000.0 / 256, block_size=1024)
    x = (np.ones(1024) * (1 + 2j)).astype(np.complex64)
    st, (iq, fft) = fe(fe.init_state(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(iq), np.conj(x))


def test_detect_center_freq():
    assert detect_center_freq("baseband_98500000Hz_12-34-56.wav") == 98500000.0
    assert detect_center_freq("capture_14074000_iq.wav") == 14074000.0
    assert detect_center_freq("noinfo.wav") is None


def test_receiver_end_to_end():
    fs = 1024000.0
    rx = Receiver(fs, block_size=131072, fft_size=4096,
                  fft_rate=fs / 32768, audio_rate=32000.0)
    src = TestSource(fs, tones=[(100000.0, -20.0)], noise_dbfs=-90.0)
    rx.sources.register("test", src)
    rx.sources.select("test")
    rx.create_vfo("vfo1", "am", offset=100000.0)
    buf = BufferSink()
    rx.sinks.set_provider("vfo1", buf)
    rx.run(3)
    audio = buf.data()
    assert len(audio) == 3 * int(131072 * 32000.0 / fs)
    assert np.all(np.isfinite(audio))
    # FFT lines collected; peak at the tone offset
    assert len(rx.fft_lines) > 0
    line = rx.fft_lines[-1]
    peak_bin = np.argmax(line)
    want = 4096 // 2 + int(100000.0 / fs * 4096)
    assert abs(peak_bin - want) <= 2
    # -20 dBFS tone reads ~-20 dB with unity-gain window
    assert abs(line[peak_bin] + 20.0) < 1.5


def test_receiver_vfo_lifecycle():
    fs = 512000.0
    rx = Receiver(fs, block_size=65536, fft_size=1024, fft_rate=fs / 16384,
                  audio_rate=32000.0)
    src = TestSource(fs, tones=[(50000.0, -10.0)])
    rx.sources.register("test", src)
    rx.sources.select("test")
    rx.create_vfo("a", "nfm", offset=50000.0)
    rx.run(1)
    rx.create_vfo("b", "usb", offset=-100000.0)
    rx.run(1)
    rx.delete_vfo("a")
    rx.run(1)
    assert "a" not in rx._channels and "b" in rx._channels


def test_keep_skip_reshaper():
    from sdrpp_tpu.ops.reshape import KeepSkipReshaper
    r = KeepSkipReshaper(keep=4, skip=2)
    x = jnp.asarray(np.arange(18, dtype=np.float32))
    st, frames = r((), x)
    assert frames.shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(frames),
                                  [[0, 1, 2, 3], [6, 7, 8, 9], [12, 13, 14, 15]])


def test_packer_reframes_with_carry():
    from sdrpp_tpu.ops.reshape import Packer
    p = Packer(frame_len=5, dtype=jnp.float32)
    st = p.init_state()
    stream = np.arange(23, dtype=np.float32)
    got = []
    for blk in (stream[:7], stream[7:12], stream[12:]):
        st, (frames, n) = p(st, jnp.asarray(blk))
        got.extend(np.asarray(frames)[: int(n)])
    got = np.concatenate(got) if got else np.zeros(0)
    np.testing.assert_array_equal(got, stream[:20])
    assert int(st["fill"]) == 3


def test_table_source_aes17_levels():
    from sdrpp_tpu.io.sources import TableSource, decode_test_table
    # 0 dB table: peak magnitude ~1.0; -20 dB table ~0.1 (AES17 levels).
    t0 = decode_test_table("aes17_0dB")
    t20 = decode_test_table("aes17_m20dB")
    assert abs(np.max(np.abs(t0[1:])) - 1.0) < 0.01   # skip the 0x3fff marker
    assert abs(np.max(np.abs(t20[1:])) / 0.1 - 1.0) < 0.05
    # Source cycles the table with phase carry.
    src = TableSource(48000.0, "aes17_0dB")
    a = src.read(10)
    b = src.read(10)
    np.testing.assert_allclose(np.concatenate([a, b]).real[:16],
                               decode_test_table("aes17_0dB")[
                                   np.arange(16) % 16])
    # The sine tables produce a clean tone at fs/16.
    src2 = TableSource(48000.0, "sfdr119_56dB")
    x = src2.read(1600).real
    S = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    fr = np.fft.rfftfreq(len(x), 1 / 48000.0)
    assert abs(fr[np.argmax(S[1:]) + 1] - 3000.0) < 50.0  # 48k/16


def test_receiver_retune_preserves_config():
    fs = 512000.0
    rx = Receiver(fs, block_size=65536, fft_size=1024, fft_rate=fs / 16384,
                  audio_rate=32000.0)
    src = TestSource(fs, tones=[(50000.0, -10.0)])
    rx.sources.register("t", src)
    rx.sources.select("t")
    rx.create_vfo("a", "nfm", offset=50000.0, squelch_level=-60.0,
                  bandwidth=10000.0)
    rx.set_vfo_offset("a", -100000.0)
    chan = rx._channels["a"]
    assert chan.mode == "nfm"
    assert chan.squelch is not None  # squelch survived the retune
    rx.run(1)


def test_fft_zoom_uneven():
    from sdrpp_tpu.ops.spectrum import fft_zoom
    line = jnp.asarray(np.arange(1000, dtype=np.float32))
    z = np.asarray(fft_zoom(line, 0, 1000, 128))  # 1000/128 uneven
    assert z.shape == (128,)
    # Each output is the max of its span; spans partition [0, 1000).
    pixel = (np.arange(1000) * 128 // 1000)
    want = np.array([np.arange(1000)[pixel == p].max() for p in range(128)],
                    np.float32)
    np.testing.assert_array_equal(z, want)


def _spectrum_oracle_db(frame_nz, window_centered, size):
    """NumPy float64 oracle for one SpectrumFFT frame: centered unity-gain
    window (sign flip already baked into ``window_centered``), zero-pad to
    ``size``, FFT, dB power (iq_frontend.cpp:230-296 / window.h:38-64)."""
    fr = frame_nz.astype(np.complex128) * window_centered
    X = np.fft.fft(fr, n=size)
    p = (X.real * X.real + X.imag * X.imag)
    return 10.0 * np.log10(p + 1e-20)


def test_spectrum_1m_bins_tone_magnitude_center_and_snr():
    """BASELINE config #2 bound at fft_size=2^20: unity-gain magnitude,
    sign-flip centering, and noise floor of a full-scale tone, with the
    exact-interval framing (nz == size)."""
    from sdrpp_tpu.ops.windows import create_window

    size = 1 << 20
    fs = float(size)  # rate=1.0 -> interval == size: nz=size, skip=0
    spec = SpectrumFFT(size, fs, 1.0, Window.BLACKMAN_HARRIS7)
    assert spec.nz == size and spec.skip == 0

    k = 123457  # tone k bins above DC, exactly on an FFT bin
    x = np.exp(2j * np.pi * k * np.arange(size) / size).astype(np.complex64)
    line = np.asarray(spec(jnp.asarray(x)))[0]
    assert line.shape == (size,)

    want_bin = size // 2 + k
    peak_bin = int(np.argmax(line))
    assert peak_bin == want_bin, (peak_bin, want_bin)
    # unity-gain window: full-scale bin-centered tone peaks at 0 dB
    assert abs(line[peak_bin]) < 0.1, line[peak_bin]
    # SNR bound: everything outside the BH7 main lobe (+-8 bins) sits at
    # the float32 FFT noise floor, >= 90 dB below the peak
    mask = np.ones(size, bool)
    mask[want_bin - 8:want_bin + 9] = False
    floor = line[mask].max()
    assert line[peak_bin] - floor > 90.0, floor
    # full-line agreement with the float64 oracle where power is above
    # the f32 round-off floor
    w = create_window(Window.BLACKMAN_HARRIS7, size, centered=True)
    ref = _spectrum_oracle_db(x, w, size)
    sig = ref > -90.0
    np.testing.assert_allclose(line[sig], ref[sig], atol=0.05)


def test_spectrum_1m_bins_zero_padded_framing():
    """1M-bin spectrum with nz < size (zero-padded frames, the fft_rate-
    limited framing of iq_frontend.h:56-60) against the float64 oracle."""
    from sdrpp_tpu.ops.windows import create_window

    size = 1 << 20
    fs, rate = 20e6, 20.0  # interval 1e6 < 2^20 -> nz=1e6, zero-pad 48576
    spec = SpectrumFFT(size, fs, rate, Window.BLACKMAN_HARRIS7)
    assert spec.nz == 1000000 and spec.skip == 0
    assert spec.frame_len == 1000000

    f_tone = 3.2e6
    n = spec.frame_len
    x = (0.5 * np.exp(2j * np.pi * f_tone * np.arange(n) / fs)
         ).astype(np.complex64)
    line = np.asarray(spec(jnp.asarray(x)))[0]

    want_bin = size // 2 + int(round(f_tone / fs * size))
    peak_bin = int(np.argmax(line))
    assert abs(peak_bin - want_bin) <= 1, (peak_bin, want_bin)

    w = create_window(Window.BLACKMAN_HARRIS7, spec.nz, centered=True)
    ref = _spectrum_oracle_db(x[:spec.nz], w, size)
    sig = ref > -90.0
    assert sig.sum() >= 8  # at least the main lobe
    np.testing.assert_allclose(line[sig], ref[sig], atol=0.05)


def test_spectrum_1m_bins_skip_framing():
    """1M bins with interval > size: the skipped tail must not leak into
    the frame (keep/skip of iq_frontend.h:56-60 at full display size)."""
    size = 1 << 20
    fs = float(2 * size)  # rate=1.0 -> interval = 2*size: nz=size, skip=size
    spec = SpectrumFFT(size, fs, 1.0, Window.BLACKMAN_HARRIS7)
    assert spec.nz == size and spec.skip == size

    k = 4096
    n = spec.frame_len  # one frame: size kept + size skipped
    x = np.exp(2j * np.pi * k * np.arange(n) / size).astype(np.complex64)
    # poison the skipped region: if it leaked into the FFT the floor jumps
    x[size:] = 37.0
    line = np.asarray(spec(jnp.asarray(x)))[0]
    peak_bin = int(np.argmax(line))
    assert peak_bin == size // 2 + k
    assert abs(line[peak_bin]) < 0.1, line[peak_bin]
