"""End-to-end: BASELINE config #1 — file IQ -> VFO -> decimate -> AM -> audio.

Writes a synthetic AM-channel IQ WAV, runs the full RadioChannel, writes the
audio back to WAV, and checks recovered tone quality — the golden-file
pattern from SURVEY.md §4 (implication (b))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrpp_tpu.io import wav
from sdrpp_tpu.models.radio import RadioChannel


def tone_snr(audio, fs, f0, skip=0.25):
    seg = np.asarray(audio, np.float64)[int(len(audio) * skip):]
    seg = seg - seg.mean()
    win = np.hanning(len(seg))
    S = np.abs(np.fft.rfft(seg * win)) ** 2
    freqs = np.fft.rfftfreq(len(seg), 1 / fs)
    k = np.argmin(np.abs(freqs - f0))
    sig = S[max(k - 3, 0): k + 4].sum()
    noise = S[1:].sum() - sig
    return 10 * np.log10(sig / max(noise, 1e-30))


@pytest.mark.parametrize("fmt", ["u8", "i16", "i24", "i32", "f32"])
def test_wav_roundtrip(tmp_path, fmt):
    rng = np.random.default_rng(0)
    data = (rng.standard_normal((1000, 2)) * 0.5).clip(-1, 1).astype(np.float32)
    p = tmp_path / f"t_{fmt}.wav"
    wav.write_wav(p, 48000, data, fmt)
    info, got = wav.read_wav(p)
    assert info.samplerate == 48000 and info.channels == 2
    tol = {"u8": 1e-2, "i16": 1e-4, "i24": 1e-6, "i32": 1e-7, "f32": 0}[fmt]
    np.testing.assert_allclose(got, data, atol=tol + 1e-7)


def test_wav_iq_mono_duplicates(tmp_path):
    data = np.linspace(-0.5, 0.5, 100).astype(np.float32)
    p = tmp_path / "mono.wav"
    wav.write_wav(p, 96000, data, "f32")
    fs, iq = wav.read_wav_iq(p)
    assert fs == 96000
    np.testing.assert_allclose(iq.real, iq.imag)


def test_config1_file_am_chain(tmp_path):
    # Synthesize: 96 kHz capture, AM channel at +20 kHz, 1 kHz audio tone.
    fs_in = 96000.0
    f_ch = 20000.0
    f_aud = 1000.0
    chan = RadioChannel("am", fs_in, offset=f_ch, audio_rate=48000.0)
    n = chan.block_multiple * max(1, 192000 // chan.block_multiple)
    t = np.arange(2 * n) / fs_in
    msg = 0.5 * np.sin(2 * np.pi * f_aud * t)
    iq = 0.5 * (1.0 + msg) * np.exp(2j * np.pi * f_ch * t)
    iq = iq.astype(np.complex64)

    # Through the file path (stereo IQ WAV, 16-bit like typical captures).
    p = tmp_path / "capture.wav"
    wav.write_wav(p, int(fs_in), np.stack([iq.real, iq.imag], -1), "i16")
    fs_read, iq_read = wav.read_wav_iq(p)
    assert fs_read == fs_in

    step = jax.jit(lambda st, x: chan(st, x))
    st = chan.init_state()
    outs = []
    for blk in (iq_read[:n], iq_read[n:2 * n]):
        st, audio = step(st, jnp.asarray(blk))
        outs.append(np.asarray(audio))
    audio = np.concatenate(outs)

    out_rate = 48000.0
    assert len(audio) == int(2 * n * out_rate / fs_in)
    snr = tone_snr(audio, out_rate, f_aud)
    assert snr > 30, snr

    # Write the audio out (the recorder sink path).
    wav.write_wav(tmp_path / "audio.wav", int(out_rate), audio, "i16")
    info, back = wav.read_wav(tmp_path / "audio.wav")
    assert info.samplerate == int(out_rate)


def test_config1_squelch_and_blanker_path(tmp_path):
    fs_in = 96000.0
    chan = RadioChannel("am", fs_in, offset=10000.0, squelch_level=-50.0,
                        noise_blanker=True)
    n = chan.block_multiple * max(1, 48000 // chan.block_multiple)
    t = np.arange(n) / fs_in
    iq = (0.5 * np.exp(2j * np.pi * 10000.0 * t)).astype(np.complex64)
    st = chan.init_state()
    st, audio = jax.jit(chan)(st, jnp.asarray(iq))
    assert np.all(np.isfinite(np.asarray(audio)))


def test_nfm_channel_with_fmif_nr():
    fs_in = 96000.0
    chan = RadioChannel("nfm", fs_in, offset=10000.0, fm_if_nr=True)
    n = chan.block_multiple * max(1, 96000 // chan.block_multiple)
    t = np.arange(n) / fs_in
    iq = (0.5 * np.exp(1j * (2 * np.pi * 10000.0 * t
                             + np.cumsum(2 * np.pi * 5000.0
                                         * np.sin(2 * np.pi * 1000.0 * t)
                                         / fs_in)))).astype(np.complex64)
    st, audio = jax.jit(chan)(chan.init_state(), jnp.asarray(iq))
    audio = np.asarray(audio)
    assert np.all(np.isfinite(audio))
    assert tone_snr(audio, 48000.0, 1000.0) > 20


def test_raw_mode_passes_iq_as_stereo():
    chan = RadioChannel("raw", 96000.0, offset=20000.0, audio_rate=48000.0)
    n = chan.block_multiple * 4096
    t = np.arange(n) / 96000.0
    iq = np.exp(2j * np.pi * 21000.0 * t).astype(np.complex64)
    st, out = jax.jit(chan)(chan.init_state(), jnp.asarray(iq))
    out = np.asarray(out)
    assert out.shape == (n // 2, 2)
    z = out[..., 0] + 1j * out[..., 1]
    spec = np.abs(np.fft.fft(z[len(z) // 2:]))
    freqs = np.fft.fftfreq(len(spec), 1 / 48000.0)
    # 21 kHz mixed by -20 kHz -> 1 kHz complex tone in the stereo I/Q out
    assert abs(freqs[np.argmax(spec)] - 1000.0) < 30.0


@pytest.mark.parametrize("fmt", ["u8", "i16", "i24", "f32"])
def test_wav_stream_reader_matches_batch(tmp_path, fmt):
    from sdrpp_tpu.io.wav import WavStreamReader, read_wav_iq, write_wav
    rng = np.random.default_rng(10)
    iq = (0.5 * (rng.standard_normal(5000) + 1j * rng.standard_normal(5000))
          ).clip(-1, 1).astype(np.complex64)
    p = tmp_path / f"s_{fmt}.wav"
    write_wav(p, 48000, np.stack([iq.real, iq.imag], -1), fmt)
    fs, whole = read_wav_iq(p)
    r = WavStreamReader(p)
    assert r.samplerate == 48000 and r.num_frames == 5000
    chunks = [r.read(1234, loop=False) for _ in range(5)]
    got = np.concatenate(chunks)[:5000]
    np.testing.assert_allclose(got.real, whole.real, atol=2e-6)
    np.testing.assert_allclose(got.imag, whole.imag, atol=2e-6)
    # looping wraps to the start
    r.seek(4990)
    wrap = r.read(20)
    np.testing.assert_allclose(wrap[:10].real, whole[4990:].real, atol=2e-6)
    np.testing.assert_allclose(wrap[10:].real, whole[:10].real, atol=2e-6)
    r.close()
