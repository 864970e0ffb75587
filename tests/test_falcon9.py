"""Falcon 9 telemetry decoder (decoder_modules/falcon9_decoder)."""

import numpy as np
import pytest

from sdrpp_tpu.decoders import falcon9 as f9


def test_ccsds_randomizer_matches_reference_table():
    # falcon_fec.h randVals prefix
    ref = [0xFF, 0x48, 0x0E, 0xC0, 0x9A, 0x0D, 0x70, 0xBC,
           0x8E, 0x2C, 0x93, 0xAD, 0xA7, 0xB7, 0x46, 0xCE]
    assert list(f9.RAND_VALS[:16]) == ref
    assert len(f9.RAND_VALS) == 255


def test_dual_basis_tables_are_inverse():
    assert np.array_equal(f9.FROM_DB[f9.TO_DB], np.arange(256))
    assert np.array_equal(f9.TO_DB[f9.FROM_DB], np.arange(256))


def test_falcon_rs_roundtrip_with_errors():
    rng = np.random.default_rng(0)
    rs = f9.FalconRS()
    payload = rng.integers(0, 256, 4 + f9.DATA_LEN).astype(np.uint8)
    wire = rs.encode(payload)
    assert rs.decode(wire) is not None
    # 8 byte errors per interleaved RS block (= the 16-root code's limit)
    w2 = wire.copy()
    for b in range(5):
        for j in rng.choice(255, 8, replace=False):
            w2[5 * j + b] ^= rng.integers(1, 256)
    dec = rs.decode(w2)
    assert dec is not None and np.array_equal(dec, payload)
    # 9 errors in one block -> uncorrectable -> frame dropped
    w3 = wire.copy()
    for j in rng.choice(255, 9, replace=False):
        w3[5 * j] ^= rng.integers(1, 256)
    assert rs.decode(w3) is None


def _frame(counter, pkt_ptr, data):
    hdr = bytes([(counter >> 13) & 0b111111,
                 (counter >> 5) & 0xFF,
                 ((counter & 0b11111) << 3) | ((pkt_ptr >> 8) & 0b111),
                 pkt_ptr & 0xFF])
    return np.frombuffer(hdr + data.ljust(f9.DATA_LEN, b"\0"), np.uint8)


def _packet(pkt_id, body):
    # layout per sinkHandler (main.cpp:187-199): len(2) id(8) pad(15) body,
    # then a 2-byte trailer (the reference zero-terminates at length-2);
    # the length field stores total-2.
    total = 2 + 8 + 15 + len(body) + 2
    pkt = bytes([(total - 2) >> 8 & 0b1111, (total - 2) & 0xFF])
    pkt += pkt_id.to_bytes(8, "big") + bytes(15) + body + bytes(2)
    return pkt


def test_packet_sync_single_and_split_frames():
    ps = f9.FalconPacketSync()
    p1 = _packet(f9.PKT_GPS_A, b"hello gps log\n")
    p2 = _packet(0x0101010101010101, b"other")
    both = p1 + p2
    got = ps.process(_frame(1, 0, both))
    assert [bytes(p) for p in got] == [p1, p2]

    # split one packet across two consecutive frames
    ps = f9.FalconPacketSync()
    big = _packet(f9.PKT_GPS_B, bytes(1500))
    f1, f2 = big[:f9.DATA_LEN], big[f9.DATA_LEN:]
    assert ps.process(_frame(1, 0, f1)) == []
    got = ps.process(_frame(2, len(f2), f2 + p1))
    assert got[0] == big and got[1] == p1

    # missed frame cancels the partial packet
    ps = f9.FalconPacketSync()
    assert ps.process(_frame(1, 0, f1)) == []
    got = ps.process(_frame(5, len(f2), f2 + p1))  # counter jump
    assert got == [p1]


def test_parse_packet_kinds():
    gps = _packet(f9.PKT_GPS_A, b"lat=1 lon=2\n")
    kind, body = f9.parse_packet(gps)
    assert kind == "gps" and body == b"lat=1 lon=2\n"
    vid = _packet(f9.PKT_VIDEO, bytes(940))
    kind, body = f9.parse_packet(vid)
    assert kind == "video" and len(body) == 940
    assert f9.parse_packet(_packet(0x42, b"x"))[0] == "other"


def test_falcon9_end_to_end_fm():
    """Modulate wire frames as 3.5714 MBaud FM at 6 Msps and decode."""
    rng = np.random.default_rng(1)
    rs = f9.FalconRS()
    gps_text = b"GPS: T+00:01:02 OK\n"
    pkt = _packet(f9.PKT_GPS_A, gps_text)
    payloads = [np.frombuffer(pkt + bytes(f9.DATA_LEN - len(pkt)), np.uint8)]
    frames_bits = []
    for k, pl in enumerate(payloads):
        frame = _frame(k + 1, 0, pl.tobytes())
        wire = rs.encode(frame)
        bits = np.concatenate([f9.SYNC_BITS, np.unpackbits(wire)])
        assert len(bits) == f9.FRAME_BITS
        frames_bits.append(bits)

    # PN run-in for MM lock + frames
    bits = np.concatenate(
        [rng.integers(0, 2, 4000).astype(np.uint8)] + frames_bits
        + [rng.integers(0, 2, 500).astype(np.uint8)])
    sym = bits.astype(np.float64) * 2.0 - 1.0
    fs, baud = f9.Falcon9Decoder.INPUT_RATE, f9.Falcon9Decoder.BAUDRATE
    sps = fs / baud
    n = int(len(sym) * sps)
    idx = np.minimum((np.arange(n) / sps).astype(np.int64), len(sym) - 1)
    wave = sym[idx]
    phase = np.cumsum(2 * np.pi * f9.Falcon9Decoder.DEVIATION * wave / fs)
    iq = np.exp(1j * phase).astype(np.complex64)

    dec = f9.Falcon9Decoder()
    results = []
    bs = 8192
    for i in range(0, len(iq) - bs + 1, bs):
        results.extend(dec.process(iq[i:i + bs]))
    kinds = [k for k, _ in results]
    assert "gps" in kinds
    body = dict((k, b) for k, b in results)["gps"]
    assert body == gps_text
