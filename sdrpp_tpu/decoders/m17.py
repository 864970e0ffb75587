"""M17 digital-voice coding layer: Golay(24,12), CRC16, base-40 callsigns,
LSF decode.

Reference: decoder_modules/m17_decoder/src/{golay24.h, crc16.h, base40.cpp,
lsf_decode.cpp, m17dsp.h} (Mobilinkd implementations). The RF chain is the
GFSK demodulator (models/digital.GFSKDemod); this module is the bit layer:

- Golay(24,12): generator POLY 0xC75, codeword = checkbits(11)|data(12)
  plus an overall parity bit; decode corrects up to 3 bit errors via a
  syndrome table (golay24.h:93-200).
- CRC16: poly 0x5935 init 0xFFFF (the M17 spec CRC, crc16.h).
- base-40 callsign decode (base40.cpp:3-16).

All host-side bit manipulation (the per-frame data rate is trivial).
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["golay24_encode", "golay24_decode", "crc16", "decode_callsign_base40",
           "encode_callsign_base40"]

_POLY = 0xC75
_B40 = " ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-/."


def _syndrome(codeword: int) -> int:
    codeword &= 0xFFFFFF
    for _ in range(12):
        if codeword & 1:
            codeword ^= _POLY
        codeword >>= 1
    return codeword << 12


def _parity(x: int) -> int:
    return bin(x).count("1") & 1


def golay24_encode(data: int) -> int:
    """12-bit data -> 24-bit codeword (checkbits|data|parity),
    golay24.h encode24."""
    data &= 0xFFF
    codeword = data
    for _ in range(12):
        if codeword & 1:
            codeword ^= _POLY
        codeword >>= 1
    cw23 = codeword | (data << 11)
    return (cw23 << 1) | _parity(cw23)


@functools.lru_cache(maxsize=1)
def _lut():
    """syndrome -> error pattern for all <=3-bit errors (golay24.h make_lut)."""
    table = {}
    veclen = 23
    table[_syndrome(0)] = 0
    for i in range(veclen):
        v = 1 << i
        table.setdefault(_syndrome(v), v)
    for i in range(veclen - 1):
        for j in range(i + 1, veclen):
            v = (1 << i) | (1 << j)
            table.setdefault(_syndrome(v), v)
    for i in range(veclen - 2):
        for j in range(i + 1, veclen - 1):
            for k in range(j + 1, veclen):
                v = (1 << i) | (1 << j) | (1 << k)
                table.setdefault(_syndrome(v), v)
    return table


def golay24_decode(codeword: int) -> int | None:
    """24-bit codeword -> corrected 12-bit data, or None if uncorrectable."""
    syndrm = _syndrome(codeword >> 1)
    corr = _lut().get(syndrm)
    if corr is None:
        return None
    fixed = codeword ^ (corr << 1)
    # Only test parity for 3-bit errors (golay24.h decode).
    ok = bin(syndrm).count("1") < 3 or not _parity(fixed)
    return ((fixed >> 12) & 0xFFF) if ok else None


def crc16(data: bytes, poly: int = 0x5935, init: int = 0xFFFF) -> int:
    """M17 CRC16 (crc16.h): MSB-first with augmented zero flush."""
    reg = init
    # reset() quirk: the initial register is run through 16 reflected steps.
    for _ in range(16):
        bit = reg & 1
        if bit:
            reg ^= poly
        reg >>= 1
        if bit:
            reg |= 0x8000
    reg &= 0xFFFF
    for byte in data:
        for i in range(8):
            msb = reg & 0x8000
            reg = ((reg << 1) & 0xFFFF) | ((byte >> (7 - i)) & 1)
            if msb:
                reg ^= poly
    for _ in range(16):
        msb = reg & 0x8000
        reg = (reg << 1) & 0xFFFF
        if msb:
            reg ^= poly
    return reg & 0xFFFF


def decode_callsign_base40(encoded: int) -> str:
    """base-40 callsign decode (base40.cpp:3-16)."""
    if encoded >= 40 ** 9:
        return ""
    out = []
    while encoded > 0:
        out.append(_B40[encoded % 40])
        encoded //= 40
    return "".join(out)


def encode_callsign_base40(callsign: str) -> int:
    encoded = 0
    for ch in reversed(callsign):
        idx = _B40.find(ch.upper())
        if idx < 0:
            raise ValueError(f"invalid callsign char {ch!r}")
        encoded = encoded * 40 + idx
    return encoded
