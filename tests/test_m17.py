"""M17 coding-layer tests: Golay(24,12), CRC16, base-40."""

import numpy as np
import pytest

from sdrpp_tpu.decoders.m17 import (crc16, decode_callsign_base40,
                                    encode_callsign_base40, golay24_decode,
                                    golay24_encode)


def test_golay_roundtrip_clean():
    for data in (0x000, 0xFFF, 0xA5A, 0x123, 0x800):
        cw = golay24_encode(data)
        assert golay24_decode(cw) == data


def test_golay_corrects_up_to_3_errors():
    rng = np.random.default_rng(0)
    for trial in range(50):
        data = int(rng.integers(0, 1 << 12))
        cw = golay24_encode(data)
        nerr = int(rng.integers(1, 4))
        pos = rng.choice(23, nerr, replace=False)
        corrupted = cw
        for p in pos:
            corrupted ^= 1 << (int(p) + 1)  # avoid the parity bit slot
        assert golay24_decode(corrupted) == data, (data, nerr)


def test_golay_detects_uncorrectable():
    rng = np.random.default_rng(1)
    fails = 0
    for trial in range(50):
        data = int(rng.integers(0, 1 << 12))
        cw = golay24_encode(data)
        pos = rng.choice(24, 5, replace=False)
        corrupted = cw
        for p in pos:
            corrupted ^= 1 << int(p)
        out = golay24_decode(corrupted)
        if out != data:
            fails += 1
    # 5-bit errors are beyond capability: most must fail or miscorrect.
    assert fails > 25


def test_crc16_m17_vectors():
    # M17 spec test vectors for the 0x5935/0xFFFF CRC.
    assert crc16(b"") == 0xFFFF
    assert crc16(b"A") == 0x206E
    assert crc16(b"123456789") == 0x772B


def test_base40_roundtrip():
    for cs in ("AB1CDE", "W1AW", "SP5WWP", "N0CALL/P"):
        enc = encode_callsign_base40(cs)
        assert decode_callsign_base40(enc) == cs
    assert decode_callsign_base40(40 ** 9 + 1) == ""


def test_lsf_roundtrip():
    from sdrpp_tpu.decoders.m17 import decode_lsf, encode_lsf
    type_word = (1 << 0) | (2 << 1) | (0 << 3) | (5 << 7)  # stream, voice, CAN 5
    frame = encode_lsf("SP5WWP", "N0CALL", type_word, b"HELLO")
    lsf = decode_lsf(frame)
    assert lsf.valid
    assert lsf.dst == "SP5WWP" and lsf.src == "N0CALL"
    assert lsf.is_stream and lsf.data_type == 2 and lsf.channel_access_num == 5
    assert lsf.meta.startswith(b"HELLO")
    # CRC failure detection
    bad = bytearray(frame)
    bad[3] ^= 0x40
    assert not decode_lsf(bytes(bad)).valid
