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
