"""WAV reader/writer for IQ capture and audio output.

Format matrix per the reference WAV reader
(source_modules/file_source/src/wavreader.h — RIFF + WAVE_FORMAT_EXTENSIBLE,
PCM 8/16/24/32-bit and float 32/64) and writer (core/src/utils/wav.h:41-90).
Conversion conventions follow file_source's tight loops
(source_modules/file_source/src/main.cpp:294-436): PCM8 is unsigned offset-
128/128, PCM16 /32768, PCM24 /8388608, PCM32 /2147483648, floats passthrough;
mono IQ duplicates I into Q. Tolerates trailing-garbage/short data chunks
(the reference reader "tolerates broken headers").
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

__all__ = ["WavInfo", "read_wav", "read_wav_iq", "write_wav"]

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_EXTENSIBLE = 0xFFFE


class WavInfo:
    def __init__(self, samplerate, channels, bits, fmt):
        self.samplerate = samplerate
        self.channels = channels
        self.bits = bits
        self.format = fmt

    def __repr__(self):
        return (f"WavInfo(rate={self.samplerate}, ch={self.channels}, "
                f"bits={self.bits}, fmt={self.format:#x})")


def _decode_samples(raw: bytes, fmt: int, bits: int, channels: int) -> np.ndarray:
    if fmt == WAVE_FORMAT_PCM:
        if bits == 8:
            data = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
            data = (data - 128.0) / 128.0
        elif bits == 16:
            data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8)
            n = len(b) // 3
            b = b[: n * 3].reshape(n, 3)
            vals = (b[:, 0].astype(np.int32)
                    | (b[:, 1].astype(np.int32) << 8)
                    | (b[:, 2].astype(np.int32) << 16))
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            data = vals.astype(np.float32) / 8388608.0
        elif bits == 32:
            data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif fmt == WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            data = np.frombuffer(raw, dtype="<f4").astype(np.float32)
        elif bits == 64:
            data = np.frombuffer(raw, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format {fmt:#x}")
    n = len(data) // channels
    return data[: n * channels].reshape(n, channels)


def read_wav(path) -> tuple[WavInfo, np.ndarray]:
    """Parse a RIFF/WAVE file -> (info, float32 [n, channels])."""
    blob = Path(path).read_bytes()
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = bits = channels = rate = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt == WAVE_FORMAT_EXTENSIBLE:
                # SubFormat GUID's first u16 is the real format tag
                (fmt,) = struct.unpack_from("<H", body, 24)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    info = WavInfo(rate, channels, bits, fmt)
    return info, _decode_samples(data, fmt, bits, channels)


def read_wav_iq(path) -> tuple[float, np.ndarray]:
    """Read an IQ capture -> (samplerate, complex64).

    Stereo: L=I, R=Q. Mono: Q := I (reference file_source main.cpp
    mono handling)."""
    info, data = read_wav(path)
    if info.channels == 1:
        i = q = data[:, 0]
    else:
        i, q = data[:, 0], data[:, 1]
    return float(info.samplerate), (i + 1j * q).astype(np.complex64)


def write_wav(path, samplerate: int, data: np.ndarray, sample_format: str = "i16"):
    """Write float data [n] or [n, ch] as WAV.

    ``sample_format``: u8 | i16 | i24 | i32 | f32 (the reference recorder's
    depth options, misc_modules/recorder/src/main.cpp:48-60)."""
    data = np.asarray(data, dtype=np.float32)
    if data.ndim == 1:
        data = data[:, None]
    n, channels = data.shape
    if sample_format == "u8":
        fmt, bits = WAVE_FORMAT_PCM, 8
        payload = np.clip(np.rint(np.clip(data, -1, 1) * 128.0) + 128.0, 0, 255) \
            .astype(np.uint8).tobytes()
    elif sample_format == "i16":
        fmt, bits = WAVE_FORMAT_PCM, 16
        payload = np.rint(np.clip(data, -1, 1) * 32767.0).astype("<i2").tobytes()
    elif sample_format == "i24":
        fmt, bits = WAVE_FORMAT_PCM, 24
        vals = np.rint(np.clip(data, -1, 1) * 8388607.0).astype(np.int32).reshape(-1)
        b = np.zeros((len(vals), 3), np.uint8)
        b[:, 0] = vals & 0xFF
        b[:, 1] = (vals >> 8) & 0xFF
        b[:, 2] = (vals >> 16) & 0xFF
        payload = b.tobytes()
    elif sample_format == "i32":
        fmt, bits = WAVE_FORMAT_PCM, 32
        # float64: 2147483647 is not representable in float32.
        payload = np.rint(np.clip(data.astype(np.float64), -1, 1) * 2147483647.0) \
            .astype("<i4").tobytes()
    elif sample_format == "f32":
        fmt, bits = WAVE_FORMAT_IEEE_FLOAT, 32
        payload = data.astype("<f4").tobytes()
    else:
        raise ValueError(f"unsupported sample format {sample_format}")

    block_align = channels * bits // 8
    byte_rate = samplerate * block_align
    hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, fmt, channels, int(samplerate),
                                 int(byte_rate), block_align, bits)
    hdr += b"data" + struct.pack("<I", len(payload))
    Path(path).write_bytes(hdr + payload)


class WavStreamReader:
    """Streaming IQ reader over a memory-mapped WAV data chunk.

    The simple reader above decodes the whole file up front; for
    multi-gigabyte captures (SURVEY §7 hard part: host ingest at GB/s) this
    reader memory-maps the data chunk and converts per-chunk on demand —
    through the native C++ converters (utils/native) when available.
    """

    def __init__(self, path):
        import mmap

        self.path = Path(path)
        self._f = open(self.path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        blob = self._mm
        if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        pos = 12
        self.info = None
        self._data_off = self._data_len = None
        while pos + 8 <= len(blob):
            cid = blob[pos : pos + 4]
            (size,) = struct.unpack_from("<I", blob, pos + 4)
            if cid == b"fmt ":
                fmt, channels, rate = struct.unpack_from("<HHI", blob, pos + 8)
                (bits,) = struct.unpack_from("<H", blob, pos + 8 + 14)
                if fmt == WAVE_FORMAT_EXTENSIBLE:
                    (fmt,) = struct.unpack_from("<H", blob, pos + 8 + 24)
                self.info = WavInfo(rate, channels, bits, fmt)
            elif cid == b"data":
                self._data_off = pos + 8
                self._data_len = min(size, len(blob) - pos - 8)
            pos += 8 + size + (size & 1)
        if self.info is None or self._data_off is None:
            raise ValueError("missing fmt/data chunk")
        self.samplerate = float(self.info.samplerate)
        self._frame_bytes = self.info.channels * self.info.bits // 8
        self.num_frames = self._data_len // self._frame_bytes
        self.pos = 0

    def seek(self, frame: int):
        self.pos = int(frame) % max(self.num_frames, 1)

    def read(self, n: int, loop: bool = True) -> np.ndarray:
        """Read n frames as complex64 IQ (mono duplicates I)."""
        out = np.empty(n, np.complex64)
        outf = out.view(np.float32)
        got = 0
        while got < n:
            take = min(n - got, self.num_frames - self.pos)
            if take <= 0:
                if not loop:
                    out[got:] = 0
                    break
                self.pos = 0
                continue
            start = self._data_off + self.pos * self._frame_bytes
            fn = self._native_fn()
            if fn is not None:
                # zero-copy: convert straight from the mapped data chunk
                # into the caller's complex64 buffer (no mmap slice copy,
                # no temp float buffer) — the host-ingest hot path.
                raw = np.frombuffer(self._mm, np.uint8,
                                    count=take * self._frame_bytes,
                                    offset=start)
                dst = outf[2 * got : 2 * (got + take)]
                fn(raw.ctypes.data, dst.ctypes.data, take, self.info.channels)
            else:
                raw = self._mm[start : start + take * self._frame_bytes]
                out[got : got + take] = self._convert(raw, take)
            got += take
            self.pos += take
            if self.pos >= self.num_frames and loop:
                self.pos = 0
        return out

    def _native_fn(self):
        try:
            from ..utils import native
            lib = native.load()
        except Exception:
            return None
        if lib is None:
            return None
        return {
            (WAVE_FORMAT_PCM, 8): lib.conv_pcm8_iq,
            (WAVE_FORMAT_PCM, 16): lib.conv_pcm16_iq,
            (WAVE_FORMAT_PCM, 24): lib.conv_pcm24_iq,
            (WAVE_FORMAT_PCM, 32): lib.conv_pcm32_iq,
            (WAVE_FORMAT_IEEE_FLOAT, 32): lib.conv_f32_iq,
            (WAVE_FORMAT_IEEE_FLOAT, 64): lib.conv_f64_iq,
        }.get((self.info.format, self.info.bits))

    def _convert(self, raw: bytes, frames: int) -> np.ndarray:
        info = self.info
        fn = self._native_fn()
        if fn is not None:
            buf = np.frombuffer(raw, np.uint8)
            out = np.empty(2 * frames, np.float32)
            fn(buf.ctypes.data, out.ctypes.data, frames, info.channels)
            return out.view(np.complex64)
        data = _decode_samples(raw, info.format, info.bits, info.channels)
        if info.channels == 1:
            i = q = data[:, 0]
        else:
            i, q = data[:, 0], data[:, 1]
        return (i + 1j * q).astype(np.complex64)

    def close(self):
        self._mm.close()
        self._f.close()
