"""Host pipeline helpers (utils/pipeline.py)."""

import numpy as np

from sdrpp_tpu.io.sources import TestSource
from sdrpp_tpu.utils.pipeline import DeferredWriter, Prefetcher


def test_prefetcher_preserves_stream():
    a = TestSource(1000000.0, tones=[(100000.0, -20.0)], noise_dbfs=-60.0)
    b = TestSource(1000000.0, tones=[(100000.0, -20.0)], noise_dbfs=-60.0)
    pre = Prefetcher(b, 4096, depth=3)
    try:
        for _ in range(16):
            np.testing.assert_array_equal(a.read(4096), pre.read(4096))
    finally:
        pre.close()


def test_prefetcher_eof_short_block(tmp_path):
    from sdrpp_tpu.io.sources import FileSource
    from sdrpp_tpu.io.wav import write_wav

    rng = np.random.default_rng(0)
    iq = rng.standard_normal((10000, 2)).astype(np.float32) * 0.1
    p = tmp_path / "short.wav"
    write_wav(p, 48000, iq, "f32")
    src = FileSource(p, loop=False)
    pre = Prefetcher(src, 4096)
    try:
        got = 0
        while True:
            chunk = pre.read(4096)
            n_real = int(np.count_nonzero(np.abs(chunk) > 0)) and len(chunk)
            got += len(chunk)
            if len(chunk) < 4096 or got >= 12288:
                break
        # FileSource(loop=False) zero-pads the tail block; total frames
        # covered must reach the file length
        assert got >= 10000
    finally:
        pre.close()


def test_deferred_writer_order_and_flush():
    written = []
    w = DeferredWriter(lambda a: written.append(a.copy()))
    blocks = [np.full(4, i, np.float32) for i in range(5)]
    for b in blocks:
        w.push(b)
    assert len(written) == 4  # last one still pending
    w.flush()
    assert len(written) == 5
    for i, b in enumerate(written):
        np.testing.assert_array_equal(b, blocks[i])
    w.flush()  # idempotent
    assert len(written) == 5
