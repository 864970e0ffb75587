"""Native host runtime (C++ via ctypes): ring buffer + wire codec."""

import threading

import numpy as np
import pytest

from sdrpp_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_ring_roundtrip():
    ring = native.NativeRing(4096)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(np.complex64)
    assert ring.write(x) == 1000
    assert ring.available() == 1000
    got = ring.read(1000)
    np.testing.assert_array_equal(got, x)
    assert ring.available() == 0


def test_ring_wraparound_and_capacity():
    ring = native.NativeRing(128)
    x = np.arange(100, dtype=np.complex64)
    assert ring.write(x) == 100
    assert ring.write(x) == 28  # only space for 28 more
    got = ring.read(128)
    np.testing.assert_array_equal(got[:100], x)
    np.testing.assert_array_equal(got[100:], x[:28])
    # wrap: write again past the physical end
    assert ring.write(x) == 100
    np.testing.assert_array_equal(ring.read(100), x)


def test_ring_threaded_producer_consumer():
    ring = native.NativeRing(1 << 14)
    total = 1 << 16
    src = np.arange(total, dtype=np.complex64)
    out = np.empty(total, np.complex64)

    def producer():
        sent = 0
        while sent < total:
            n = ring.write(src[sent : sent + 4096])
            sent += n

    t = threading.Thread(target=producer)
    t.start()
    got = 0
    while got < total:
        chunk = ring.read(min(4096, total - got))
        out[got : got + len(chunk)] = chunk
        got += len(chunk)
    t.join()
    np.testing.assert_array_equal(out, src)


def test_wire_codec_matches_python():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)).astype(np.complex64)
    q16, s16 = native.wire_quantize_i16(x)
    flat = x.view(np.float32)
    assert s16 == float(flat.max())
    ref = np.clip(np.rint(flat * (32768.0 / s16)), -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(q16, ref)
    back = native.wire_dequantize_i16(q16, s16)
    mask = flat > -s16
    np.testing.assert_allclose(back.view(np.float32)[mask], flat[mask],
                               atol=s16 / 16000)

    q8, s8 = native.wire_quantize_i8(x)
    ref8 = np.clip(np.rint(flat * (128.0 / s8)), -128, 127).astype(np.int8)
    np.testing.assert_array_equal(q8, ref8)


def test_wire_codec_all_zero_block():
    """Squelched silence (all-zero block) must quantize to zeros with a
    zero scaler and round-trip to exact zeros — not NaN garbage from a
    divide-by-zero scale."""
    z = np.zeros(1024, np.complex64)
    for quant, dequant in [(native.wire_quantize_i8, native.wire_dequantize_i8),
                           (native.wire_quantize_i16, native.wire_dequantize_i16)]:
        q, s = quant(z)
        assert s == 0.0
        assert not np.any(q)
        back = dequant(q, s)
        np.testing.assert_array_equal(back.view(np.float32),
                                      np.zeros(2048, np.float32))


def test_pool_parallel_loops_match_serial():
    """The fork-join pool (host_pool_threads) must not change results:
    large blocks (parallel) == small blocks (serial path) == python oracle,
    for the wire codec and every WAV conversion loop."""
    import ctypes

    lib = native.load()
    lib.host_pool_threads.restype = ctypes.c_size_t
    assert lib.host_pool_threads() >= 1

    rng = np.random.default_rng(7)
    n = 3_000_000  # > kValueGrain and > kFrameGrain: exercises the pool
    x = rng.standard_normal(n).astype(np.float32)
    lib.wire_quantize_i16.restype = ctypes.c_float
    q = np.empty(n, np.int16)
    s = lib.wire_quantize_i16(x.ctypes.data, q.ctypes.data, n)
    assert s == float(x.max())
    ref = np.clip(np.rint(x * (32768.0 / s)), -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(q, ref)

    frames = 1_500_000
    pcm = rng.integers(-32768, 32768, size=2 * frames).astype(np.int16)
    out = np.empty(2 * frames, np.float32)
    lib.conv_pcm16_iq(pcm.ctypes.data, out.ctypes.data, frames, 2)
    np.testing.assert_array_equal(out, pcm.astype(np.float32) / 32768.0)


def test_wav_stream_reader_zero_copy_matches_decode(tmp_path):
    """The zero-copy mmap->convert ingest path equals the numpy decode,
    across the PCM/float format matrix, mono + stereo, with loop wrap."""
    import struct

    from sdrpp_tpu.io import wav as wavmod

    rng = np.random.default_rng(3)
    frames = 10_000
    for fmt, bits, dt in [(1, 8, None), (1, 16, None), (1, 24, None),
                          (1, 32, None), (3, 32, np.float32),
                          (3, 64, np.float64)]:
        for channels in (1, 2):
            vals = rng.uniform(-0.9, 0.9, size=(frames, channels))
            if fmt == 1 and bits == 8:
                payload = ((vals * 128 + 128).astype(np.uint8)).tobytes()
            elif fmt == 1 and bits == 16:
                payload = (vals * 32768).astype(np.int16).tobytes()
            elif fmt == 1 and bits == 24:
                v = (vals * 8388608).astype(np.int32)
                b = v.astype("<i4").tobytes()
                payload = b"".join(b[i:i + 3] for i in range(0, len(b), 4))
            elif fmt == 1 and bits == 32:
                payload = (vals * 2147483648).clip(-2**31, 2**31 - 1).astype(
                    np.int32).tobytes()
            else:
                payload = vals.astype(dt).tobytes()
            block_align = channels * bits // 8
            hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
            hdr += b"fmt " + struct.pack("<IHHIIHH", 16, fmt, channels,
                                         48000, 48000 * block_align,
                                         block_align, bits)
            hdr += b"data" + struct.pack("<I", len(payload))
            p = tmp_path / f"t_{fmt}_{bits}_{channels}.wav"
            p.write_bytes(hdr + payload)

            r = wavmod.WavStreamReader(p)
            r.seek(frames - 1234)
            got = r.read(5000)  # wraps around the end
            raw = hdr = None
            full = p.read_bytes()[44:]
            d = wavmod._decode_samples(full, fmt, bits, channels)
            i = d[:, 0]
            q = d[:, 0] if channels == 1 else d[:, 1]
            ref = np.concatenate([(i + 1j * q)[frames - 1234:],
                                  (i + 1j * q)[:5000 - 1234]]).astype(
                np.complex64)
            np.testing.assert_allclose(got, ref, atol=1e-6,
                                       err_msg=f"fmt={fmt} bits={bits} ch={channels}")
            r.close()
