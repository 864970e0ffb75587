"""FLAC/MP3 recorder containers (reference recorder main.cpp:48-60,
core/src/utils/wav.cpp FLAC/LAME paths)."""

import numpy as np
import pytest

from sdrpp_tpu.io.flac import FlacWriter, read_flac, crc8, crc16
from sdrpp_tpu.io.sinks import RecorderSink


def _tonal(n, ch=2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 48000.0
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 997 * t)
    x = np.stack([sig * (0.5 + 0.5 * c) for c in range(ch)], -1)
    return x + 0.01 * rng.standard_normal((n, ch))


def _quant(x, bits):
    full = float(1 << (bits - 1))
    return np.clip(np.rint(x.astype(np.float64) * full), -full, full - 1) \
        .astype(np.int32)


class TestFlac:
    def test_roundtrip_stereo_i16(self, tmp_path):
        x = _tonal(10000)
        p = tmp_path / "a.flac"
        with FlacWriter(p, 48000, channels=2, bits=16, block_size=4096) as w:
            w.write(x[:3000])
            w.write(x[3000:])
        info, dec = read_flac(p)
        assert (info.samplerate, info.channels, info.bits) == (48000, 2, 16)
        assert info.total_samples == 10000
        np.testing.assert_array_equal(dec, _quant(x, 16))

    def test_roundtrip_mono_24bit_noise(self, tmp_path):
        # incompressible input exercises high Rice params / escapes
        rng = np.random.default_rng(7)
        y = rng.integers(-(1 << 23), 1 << 23, size=5000).astype(np.int64)
        p = tmp_path / "n.flac"
        with FlacWriter(p, 44100, channels=1, bits=24, block_size=1024) as w:
            w.write(y)
        _, dec = read_flac(p)
        np.testing.assert_array_equal(dec[:, 0], y.astype(np.int32))

    def test_constant_and_short_final_frame(self, tmp_path):
        y = np.full(3001, 123, np.int64)  # 3001 % 1024 != 0 -> short last frame
        p = tmp_path / "c.flac"
        with FlacWriter(p, 8000, channels=1, bits=16, block_size=1024) as w:
            w.write(y)
        info, dec = read_flac(p)
        assert info.total_samples == 3001
        np.testing.assert_array_equal(dec[:, 0], y.astype(np.int32))

    def test_compresses_tonal_audio(self, tmp_path):
        x = _tonal(16384)
        p = tmp_path / "z.flac"
        with FlacWriter(p, 48000, channels=2, bits=16) as w:
            w.write(x)
        assert p.stat().st_size < 16384 * 2 * 2 * 0.9

    def test_stream_structure(self, tmp_path):
        p = tmp_path / "s.flac"
        with FlacWriter(p, 48000, channels=1, bits=16, block_size=256) as w:
            w.write(_tonal(256, ch=1))
        blob = p.read_bytes()
        assert blob[:4] == b"fLaC"
        # last-metadata flag + STREAMINFO type 0, length 34
        assert blob[4] == 0x80 and blob[5:8] == b"\x00\x00\x22"
        # first frame: 14-bit sync + reserved0 + fixed-blocksize0 = FF F8
        assert blob[42] == 0xFF and blob[43] == 0xF8
        # MD5 patched (nonzero)
        assert blob[26:42] != b"\x00" * 16

    def test_crc_detects_corruption(self, tmp_path):
        p = tmp_path / "bad.flac"
        with FlacWriter(p, 48000, channels=1, bits=16, block_size=1024) as w:
            w.write(_tonal(2048, ch=1))
        blob = bytearray(p.read_bytes())
        blob[-3] ^= 0x40  # flip a bit inside the last frame body
        p.write_bytes(bytes(blob))
        with pytest.raises(ValueError):
            read_flac(p)

    def test_lpc_roundtrip_and_smaller(self, tmp_path):
        # strongly-predictable signal: LPC should win over fixed predictors
        n = 16384
        t = np.arange(n) / 48000.0
        x = (0.5 * np.sin(2 * np.pi * 440.5 * t))[:, None]
        sizes = {}
        for lpc in (False, True):
            p = tmp_path / f"lpc{lpc}.flac"
            with FlacWriter(p, 48000, channels=1, bits=16, lpc=lpc) as w:
                w.write(x)
            info, dec = read_flac(p)
            np.testing.assert_array_equal(dec, _quant(x, 16))
            sizes[lpc] = p.stat().st_size
        assert sizes[True] < sizes[False]

    def test_crc_vectors(self):
        # CRC-8 poly 0x07 and CRC-16 poly 0x8005, both init 0 (RFC 9639)
        assert crc8(b"123456789") == 0xF4
        assert crc16(b"123456789") == 0xFEE8


class TestMp3:
    def test_roundtrip_correlation(self, tmp_path):
        mp3 = pytest.importorskip("sdrpp_tpu.io.mp3")
        if not mp3.available():
            pytest.skip("libmp3lame not present")
        n = 48000
        t = np.arange(n) / 48000.0
        sig = 0.5 * np.sin(2 * np.pi * 440 * t)
        x = np.stack([sig, sig], -1)
        p = tmp_path / "a.mp3"
        with mp3.Mp3Writer(p, 48000, channels=2) as w:
            w.write(x)
        assert p.stat().st_size > 1000
        rate, dec = mp3.decode_mp3(p)
        assert rate == 48000
        best = max(
            np.corrcoef(dec[lag:lag + 8000, 0], sig[:8000])[0, 1]
            for lag in range(0, 3000, 24)
            if len(dec) - lag >= 8000)
        assert best > 0.98


class TestRecorderSink:
    def test_dispatch_flac(self, tmp_path):
        p = tmp_path / "r.flac"
        s = RecorderSink(p, 48000, container="flac", channels=1)
        s.write(_tonal(4096, ch=1)[:, 0])
        s.close()
        info, dec = read_flac(p)
        assert info.total_samples == 4096

    def test_flac_rejects_float_format(self, tmp_path):
        with pytest.raises(ValueError):
            RecorderSink(tmp_path / "x.flac", 48000, container="flac",
                         sample_format="f32")

    def test_dispatch_wav(self, tmp_path):
        from sdrpp_tpu.io.wav import read_wav
        p = tmp_path / "r.wav"
        s = RecorderSink(p, 48000, container="wav")
        s.write(_tonal(1000, ch=1)[:, 0])
        s.close()
        info, _ = read_wav(p)
        assert info.samplerate == 48000


def test_cli_run_flac_container(tmp_path):
    """End-to-end: test source -> NFM chain -> FLAC recording via the CLI."""
    from sdrpp_tpu.cli import cmd_run

    out = tmp_path / "audio.flac"
    cmd_run(["--source", "test:1024000", "--mode", "nfm", "--tone", "0",
             "--out", str(out), "--container", "flac", "--blocks", "2",
             "--block-size", "131072"])
    info, dec = read_flac(out)
    assert info.samplerate == 48000
    assert info.total_samples > 0


def test_flac_stereo_decorrelation_roundtrip(tmp_path):
    """All four channel assignments (RFC 9639 §9.1.3) round-trip exactly,
    including the side channel's bits+1 coding — the foreign-file surface
    libFLAC emits by default (mid/side)."""
    from sdrpp_tpu.io.flac import FlacWriter, read_flac

    rng = np.random.default_rng(0)
    n = 9000
    t = np.arange(n)
    base = (3000 * np.sin(2 * np.pi * 440 * t / 48000)).astype(np.int64)
    noise = rng.integers(-40, 40, n)  # shared: L-R stays tiny
    left = base + noise
    right = base + noise + rng.integers(-4, 4, n)
    blk = np.stack([left, right], 1).astype(np.int64)

    for mode in ("auto", "independent", "left_side", "right_side",
                 "mid_side"):
        p = tmp_path / f"st_{mode}.flac"
        with FlacWriter(p, 48000, channels=2, bits=16, stereo_mode=mode) as w:
            w.write(blk)
        info, got = read_flac(p)  # verify=True: CRCs + MD5 must hold
        assert info.channels == 2 and info.total_samples == n
        np.testing.assert_array_equal(got, blk.astype(np.int32)), mode

    # correlated stereo must actually CHOOSE decorrelation and win size
    auto = tmp_path / "st_auto.flac"
    indep = tmp_path / "st_independent.flac"
    assert auto.stat().st_size < indep.stat().st_size


def test_flac_mid_side_odd_sum_exact(tmp_path):
    """mid/side with odd L+R (the (mid<<1)|(side&1) reconstruction bit)."""
    from sdrpp_tpu.io.flac import FlacWriter, read_flac

    rng = np.random.default_rng(1)
    blk = rng.integers(-(1 << 14), 1 << 14, (5000, 2)).astype(np.int64)
    blk[::2, 0] += 1  # force odd sums
    p = tmp_path / "ms.flac"
    with FlacWriter(p, 48000, channels=2, bits=16,
                    stereo_mode="mid_side") as w:
        w.write(blk)
    _, got = read_flac(p)
    np.testing.assert_array_equal(got, blk.astype(np.int32))
