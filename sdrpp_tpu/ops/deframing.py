"""Sync-word deframing: carve fixed-length frames out of a bit stream.

The generic deframer behind HRPT/falcon9-style decoders (the reference's
legacy dsp::Deframer, used as `deframe.init(&stream, frameLen, syncWord,
syncLen)` in decoder_modules/weather_sat_decoder/src/noaa_hrpt_decoder.h:31;
those modules are disabled by default upstream and their dsp/deframing.h is
no longer shipped — this reimplements the capability).

Vectorized sync search: correlate the ±1 bit stream against the ±1 sync
pattern with one FFT-less sliding dot product (np.correlate); positions
where the correlation reaches (sync_len - 2*max_errors) are frame starts.
Frames may span block boundaries; a carried bit buffer handles that.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Deframer"]


class Deframer:
    def __init__(self, frame_len_bits: int, sync_bits, max_sync_errors: int = 0):
        self.frame_len = int(frame_len_bits)
        self.sync = np.asarray(sync_bits, np.int8)
        assert set(np.unique(self.sync)).issubset({0, 1})
        self.max_errors = int(max_sync_errors)
        self._buf = np.zeros(0, np.uint8)

    def process(self, bits: np.ndarray) -> list[np.ndarray]:
        """Feed bits (uint8 0/1); returns a list of complete frames
        (each frame_len bits, starting with the sync word)."""
        self._buf = np.concatenate([self._buf, np.asarray(bits, np.uint8)])
        frames = []
        while True:
            start = self._find_sync(self._buf)
            if start is None or len(self._buf) - start < self.frame_len:
                # Keep at most (frame_len + sync) trailing bits for reuse.
                keep = self.frame_len + len(self.sync)
                if start is not None:
                    self._buf = self._buf[start:]
                elif len(self._buf) > keep:
                    self._buf = self._buf[-keep:]
                return frames
            frames.append(self._buf[start: start + self.frame_len].copy())
            self._buf = self._buf[start + self.frame_len:]

    def _find_sync(self, bits: np.ndarray):
        n, m = len(bits), len(self.sync)
        if n < m:
            return None
        b = bits.astype(np.int8) * 2 - 1
        s = self.sync * 2 - 1
        corr = np.correlate(b, s, mode="valid")
        want = m - 2 * self.max_errors
        hits = np.nonzero(corr >= want)[0]
        return int(hits[0]) if len(hits) else None
