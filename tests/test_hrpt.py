"""NOAA HRPT decoder (decoder_modules/weather_sat_decoder)."""

import numpy as np
import pytest

from sdrpp_tpu.decoders import hrpt


def _make_frame_words(rng, spacecraft_id=13, frame_number=1):
    words = rng.integers(0, 1024, hrpt.WORDS_PER_FRAME).astype(np.int32)
    words[:6] = hrpt.SYNC_WORDS
    words[6] = (spacecraft_id << 2) | frame_number
    return words


def test_sync_bits_layout():
    assert hrpt.SYNC_BITS.shape == (60,)
    # first word 1010000100
    assert list(hrpt.SYNC_BITS[:10]) == [1, 0, 1, 0, 0, 0, 0, 1, 0, 0]
    assert hrpt.MANCHESTER_SYNC_BITS.shape == (60,)
    assert list(hrpt.MANCHESTER_SYNC_BITS[:4]) == [1, 0, 0, 1]


def test_parse_minor_frame_fields():
    rng = np.random.default_rng(0)
    words = _make_frame_words(rng, spacecraft_id=7, frame_number=2)
    f = hrpt.parse_minor_frame(words)
    assert f.sync_errors == 0
    assert f.spacecraft_id == 7 and f.frame_number == 2
    assert f.avhrr.shape == (5, 2048)
    # channel interleave: avhrr[c, s] = word[750 + 5*s + c]
    assert f.avhrr[3, 100] == words[750 + 5 * 100 + 3]
    assert f.tip.shape == (5, 104)
    assert f.tip[2, 10] == (words[103 + 2 * 104 + 10] >> 2) & 0xFF


def test_deframer_manchester_roundtrip():
    rng = np.random.default_rng(1)
    words = _make_frame_words(rng)
    bits = np.unpackbits(
        words.astype(">u2").view(np.uint8).reshape(-1, 2),
        axis=1)[:, 6:].reshape(-1)
    raw = hrpt.manchester_encode(bits)
    assert len(raw) == hrpt.RAW_FRAME_BITS
    noise = rng.integers(0, 2, 999).astype(np.uint8)
    d = hrpt.HRPTDeframer()
    frames = []
    stream = np.concatenate([noise, raw, noise])
    for i in range(0, len(stream), 50000):
        frames.extend(d.process(stream[i:i + 50000]))
    assert len(frames) == 1
    f = frames[0]
    assert f.sync_errors == 0
    np.testing.assert_array_equal(f.words, words)


def test_deframer_tolerates_sync_bit_errors():
    rng = np.random.default_rng(2)
    words = _make_frame_words(rng)
    bits = np.unpackbits(
        words.astype(">u2").view(np.uint8).reshape(-1, 2),
        axis=1)[:, 6:].reshape(-1)
    raw = hrpt.manchester_encode(bits)
    for p in rng.choice(60, 3, replace=False):
        raw[p] ^= 1
    frames = hrpt.HRPTDeframer().process(
        np.concatenate([raw, np.zeros(70, np.uint8)]))
    assert len(frames) == 1
    # payload intact even with damaged raw sync
    np.testing.assert_array_equal(frames[0].words[6:], words[6:])


def test_hrpt_end_to_end_bpsk():
    """Full chain: manchester bits -> BPSK at 3 Msps -> HRPTDecoder."""
    rng = np.random.default_rng(3)
    words = _make_frame_words(rng, spacecraft_id=13, frame_number=1)
    bits = np.unpackbits(
        words.astype(">u2").view(np.uint8).reshape(-1, 2),
        axis=1)[:, 6:].reshape(-1)
    raw = hrpt.manchester_encode(bits)
    pn = rng.integers(0, 2, 6000).astype(np.uint8)
    sym = np.concatenate([pn, raw, rng.integers(0, 2, 2000)]) * 2.0 - 1.0

    fs = hrpt.VFO_RATE
    sps = fs / hrpt.SYMBOL_RATE
    n = int(len(sym) * sps)
    idx = np.minimum((np.arange(n) / sps).astype(np.int64), len(sym) - 1)
    iq = sym[idx].astype(np.complex64)  # NRZ BPSK
    iq *= np.exp(1j * 0.3)              # arbitrary carrier phase

    dec = hrpt.HRPTDecoder(fs)
    frames = []
    bs = 120_000
    iq = np.concatenate([iq, np.zeros((-len(iq)) % bs, np.complex64)])
    for i in range(0, len(iq), bs):
        frames.extend(dec.process(iq[i:i + bs]))
    assert len(frames) >= 1
    f = frames[0]
    assert f.sync_errors == 0
    assert f.spacecraft_id == 13 and f.frame_number == 1
    np.testing.assert_array_equal(f.avhrr.reshape(-1),
                                  words[750:750 + 10240].reshape(
                                      2048, 5).T.reshape(-1))
