"""Codec2 voice synthesis (M17 audio path, m17dsp.h:438-520)."""

import numpy as np
import pytest

from sdrpp_tpu.decoders import codec2 as c2

pytestmark = pytest.mark.skipif(not c2.available(),
                                reason="libcodec2 not present")


def _tone_bits(codec, nframes=10, f=300.0):
    t = np.arange(nframes * codec.samples_per_frame) / c2.Codec2.SAMPLE_RATE
    speech = (np.sin(2 * np.pi * f * t) * 8000).astype(np.int16)
    return codec.encode(speech)


def test_mode_3200_frame_geometry():
    codec = c2.Codec2(c2.MODE_3200)
    # 3200 bps @ 8 kHz: 160 samples (20 ms), 64 bits = 8 bytes per frame —
    # two frames per 16-byte M17 payload (m17dsp.h:509-510).
    assert codec.samples_per_frame == 160
    assert codec.bits_per_frame == 64
    assert codec.bytes_per_frame == 8


def test_encode_decode_roundtrip_preserves_tone():
    enc = c2.Codec2()
    bits = _tone_bits(enc, nframes=20)
    dec = c2.Codec2()
    out = dec.decode(bits)
    assert out.shape == (20 * 160,)
    # Vocoder output for a steady tone is loud and tone-ish: check RMS and
    # that the dominant frequency is near the input tone.
    pcm = out.astype(np.float64) / 32768.0
    rms = np.sqrt(np.mean(pcm**2))
    assert rms > 0.02
    spec = np.abs(np.fft.rfft(pcm[320:] * np.hanning(len(pcm) - 320)))
    peak_hz = np.argmax(spec) * 8000.0 / (len(pcm) - 320)
    assert abs(peak_hz - 300.0) < 50.0


def test_m17_voice_decoder_gating():
    # The reference starts synthesis only on a *consecutive* frame number
    # and mutes after a 500 ms gap (m17dsp.h:480-510).
    now = [0.0]
    dec = c2.M17VoiceDecoder(clock=lambda: now[0])
    bits = _tone_bits(dec.codec, nframes=2)

    def frame(fn):
        return bytes([fn >> 8, fn & 0xFF]) + bits[:16]

    # first frame: not consecutive with initial state -> muted
    assert dec.process(frame(5)).shape == (0, 2)
    # consecutive -> unmuted, 320 samples of stereo
    out = dec.process(frame(6))
    assert out.shape == (320, 2)
    assert np.array_equal(out[:, 0], out[:, 1])
    # non-consecutive within timeout: still receiving (reference keeps
    # synthesizing until timedOut())
    now[0] += 0.1
    assert dec.process(frame(100)).shape == (320, 2)
    # non-consecutive after timeout -> drops out
    now[0] += 1.0
    assert dec.process(frame(200)).shape == (0, 2)


def test_m17_fn_wraparound_is_consecutive():
    now = [0.0]
    dec = c2.M17VoiceDecoder(clock=lambda: now[0])
    bits = _tone_bits(dec.codec, nframes=2)
    dec.process(bytes([0x7F, 0xFF]) + bits[:16])   # fn = 0x7FFF
    out = dec.process(bytes([0x00, 0x00]) + bits[:16])  # wraps mod 0x8000
    assert out.shape == (320, 2)
