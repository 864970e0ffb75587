"""Baseband sample-stream compression (the server wire format).

Reference: core/src/dsp/compression/sample_stream_compressor.h:26-60 /
sample_stream_decompressor.h:13-36 — header {compressionType u16,
pcmType u16, scaler f32} followed by block-max-normalized i8/i16
quantization (or raw f32). SURVEY §5 keeps this as the DCN/host-egress
wire format; the quantization (max-reduce + scale + saturating cast) runs
on device so only 1/4 (i8) of the f32 bytes cross the host link.

NOTE (faithful quirk): the reference's scaler is the block's maximum
SIGNED value (volk_32f_index_max), not the absolute max — negative samples
larger in magnitude saturate. Replicated exactly.
"""

from __future__ import annotations

import struct

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "PCM_TYPE_I8", "PCM_TYPE_I16", "PCM_TYPE_F32",
    "quantize_block", "dequantize_block", "pack_frame", "unpack_frame",
]

PCM_TYPE_I8 = 0
PCM_TYPE_I16 = 1
PCM_TYPE_F32 = 2

_HDR = struct.Struct("<HHf")


def quantize_block(x: jax.Array, pcm_type: int) -> tuple[jax.Array, jax.Array]:
    """Device-side quantization of a complex block -> (ints, scaler).

    Matches the reference's VOLK convert path: scale = (128 or 32768) /
    max(interleaved floats), rounded, saturated.
    """
    flat = jnp.stack([x.real, x.imag], axis=-1).reshape(*x.shape[:-1], -1)
    if pcm_type == PCM_TYPE_F32:
        return flat, jnp.zeros((), jnp.float32)
    max_val = jnp.max(flat, axis=-1)  # signed max (reference quirk)
    if pcm_type == PCM_TYPE_I8:
        scale = 128.0 / max_val
        q = jnp.clip(jnp.round(flat * scale[..., None]), -128, 127).astype(jnp.int8)
    elif pcm_type == PCM_TYPE_I16:
        scale = 32768.0 / max_val
        q = jnp.clip(jnp.round(flat * scale[..., None]), -32768, 32767).astype(jnp.int16)
    else:
        raise ValueError(pcm_type)
    return q, max_val.astype(jnp.float32)


def dequantize_block(q: jax.Array, scaler: jax.Array, pcm_type: int) -> jax.Array:
    """Inverse: ints + scaler -> complex64 block (decompressor.h:17-33)."""
    if pcm_type == PCM_TYPE_F32:
        flat = q.astype(jnp.float32)
    elif pcm_type == PCM_TYPE_I8:
        flat = q.astype(jnp.float32) * (scaler / 128.0)
    elif pcm_type == PCM_TYPE_I16:
        flat = q.astype(jnp.float32) * (scaler / 32768.0)
    else:
        raise ValueError(pcm_type)
    pairs = flat.reshape(*flat.shape[:-1], -1, 2)
    return jax.lax.complex(pairs[..., 0], pairs[..., 1])


def pack_frame(x, pcm_type: int) -> bytes:
    """Host: complex64 block -> wire bytes (8-byte header + payload)."""
    x = np.asarray(x, np.complex64)
    if pcm_type == PCM_TYPE_F32:
        return _HDR.pack(0, PCM_TYPE_F32, 0.0) + x.tobytes()
    q, scaler = quantize_block(jnp.asarray(x), pcm_type)
    return _HDR.pack(0, pcm_type, float(scaler)) + np.asarray(q).tobytes()


def unpack_frame(frame: bytes) -> np.ndarray:
    """Host: wire bytes -> complex64 block."""
    comp, pcm_type, scaler = _HDR.unpack_from(frame, 0)
    payload = frame[8:]
    if pcm_type == PCM_TYPE_F32:
        return np.frombuffer(payload, np.complex64)
    dt = np.int8 if pcm_type == PCM_TYPE_I8 else np.int16
    q = np.frombuffer(payload, dt)
    out = np.asarray(dequantize_block(jnp.asarray(q), jnp.float32(scaler), pcm_type))
    return out.astype(np.complex64)
