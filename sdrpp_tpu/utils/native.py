"""ctypes bindings for the native host runtime (native/sdrpp_host.cpp).

Builds libsdrpp_host.so on first use (g++ is in the image; no pip). Every
binding has a NumPy fallback so the framework still works without a
toolchain — but the native paths are the production ingest/egress loops
(SPSC ring between IO threads and device steps; wire quantization at
network rates; WAV format conversion).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["load", "available", "NativeRing", "wire_quantize_i16",
           "wire_quantize_i8", "wire_dequantize_i16", "wire_dequantize_i8"]

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libsdrpp_host.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    if not hasattr(lib, "viterbi_traceback"):
        # stale prebuilt .so from before the symbol existed: rebuild once
        # (binding an absent symbol below would raise AttributeError into
        # every caller — ingest/egress paths that worked before)
        if not _build():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        if not hasattr(lib, "viterbi_traceback"):
            return None
    # Signatures
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_size_t]
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    for fn in ("ring_available", "ring_space"):
        getattr(lib, fn).restype = ctypes.c_size_t
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in ("ring_write", "ring_read"):
        getattr(lib, fn).restype = ctypes.c_size_t
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_size_t]
    lib.wire_quantize_i8.restype = ctypes.c_float
    lib.wire_quantize_i8.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_size_t]
    lib.wire_quantize_i16.restype = ctypes.c_float
    lib.wire_quantize_i16.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_size_t]
    lib.wire_dequantize_i8.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_size_t, ctypes.c_float]
    lib.wire_dequantize_i16.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_size_t, ctypes.c_float]
    for fn in ("conv_pcm8_iq", "conv_pcm16_iq", "conv_pcm24_iq",
               "conv_pcm32_iq", "conv_f32_iq", "conv_f64_iq"):
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_size_t, ctypes.c_int]
    lib.viterbi_traceback.restype = ctypes.c_uint32
    lib.viterbi_traceback.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                      ctypes.c_size_t, ctypes.c_uint32,
                                      ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


class NativeRing:
    """SPSC complex64 ring buffer backed by the native runtime."""

    def __init__(self, capacity_samples: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._ptr = lib.ring_create(capacity_samples)
        self.capacity = capacity_samples

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.ring_destroy(self._ptr)
            self._ptr = None

    def available(self) -> int:
        return self._lib.ring_available(self._ptr)

    def space(self) -> int:
        return self._lib.ring_space(self._ptr)

    def write(self, iq: np.ndarray) -> int:
        iq = np.ascontiguousarray(iq, np.complex64)
        return self._lib.ring_write(self._ptr, iq.ctypes.data, len(iq))

    def read(self, n: int) -> np.ndarray:
        out = np.empty(n, np.complex64)
        got = self._lib.ring_read(self._ptr, out.ctypes.data, n)
        return out[:got]


def wire_quantize_i16(x: np.ndarray) -> tuple[np.ndarray, float]:
    """Interleave + quantize a complex64 block (native if possible)."""
    flat = np.ascontiguousarray(x, np.complex64).view(np.float32)
    lib = load()
    if lib is not None:
        out = np.empty(flat.shape, np.int16)
        scaler = lib.wire_quantize_i16(flat.ctypes.data, out.ctypes.data, flat.size)
        return out, float(scaler)
    scaler = float(flat.max())
    q = np.clip(np.rint(flat * (32768.0 / scaler)), -32768, 32767).astype(np.int16)
    return q, scaler


def wire_quantize_i8(x: np.ndarray) -> tuple[np.ndarray, float]:
    flat = np.ascontiguousarray(x, np.complex64).view(np.float32)
    lib = load()
    if lib is not None:
        out = np.empty(flat.shape, np.int8)
        scaler = lib.wire_quantize_i8(flat.ctypes.data, out.ctypes.data, flat.size)
        return out, float(scaler)
    scaler = float(flat.max())
    q = np.clip(np.rint(flat * (128.0 / scaler)), -128, 127).astype(np.int8)
    return q, scaler


def wire_dequantize_i16(q: np.ndarray, scaler: float) -> np.ndarray:
    q = np.ascontiguousarray(q, np.int16)
    lib = load()
    if lib is not None:
        out = np.empty(q.shape, np.float32)
        lib.wire_dequantize_i16(q.ctypes.data, out.ctypes.data, q.size,
                                ctypes.c_float(scaler))
        return out.view(np.complex64)
    return (q.astype(np.float32) * (scaler / 32768.0)).view(np.complex64)


def wire_dequantize_i8(q: np.ndarray, scaler: float) -> np.ndarray:
    q = np.ascontiguousarray(q, np.int8)
    lib = load()
    if lib is not None:
        out = np.empty(q.shape, np.float32)
        lib.wire_dequantize_i8(q.ctypes.data, out.ctypes.data, q.size,
                               ctypes.c_float(scaler))
        return out.view(np.complex64)
    return (q.astype(np.float32) * (scaler / 128.0)).view(np.complex64)
