"""HPSDR (Metis Protocol-1) + RFspace NetSDR network-source protocol tests.

Mock radios validate the exact wire behavior the reference implements:
discovery framing (hpsdr.cpp:438-489), EP2 control pages
(hpsdr.cpp:194-231), EP6 24-bit IQ extraction (hpsdr.cpp:245-276),
Hermes-Lite register writes (hermes.cpp:129-141), and the RFspace control
items / UDP 16-bit data (rfspace_client.cpp).
"""

import socket
import struct
import threading

import numpy as np
import pytest

from sdrpp_tpu.io import hpsdr
from sdrpp_tpu.io import rfspace as rfs


def _make_ep6_packet(seq: int, iq24: np.ndarray, num_rx: int = 1) -> bytes:
    """Build one 1032-byte EP6 packet carrying the given 24-bit IQ values.

    iq24: int32 array [n, 2] of (re, im) 24-bit signed values; n must fill
    exactly two 512-byte frames for the rx count.
    """
    step = num_rx * 6 + 2
    per_frame = (hpsdr.USABLE_BUF_LEN[num_rx] - 8) // step
    assert len(iq24) == 2 * per_frame
    frames = []
    for half in (iq24[:per_frame], iq24[per_frame:]):
        body = bytearray()
        for re, im in half:
            # wire layout: first 3 bytes -> im, next 3 -> re (hpsdr.cpp:263-264)
            body += int(im & 0xFFFFFF).to_bytes(3, "big")
            body += int(re & 0xFFFFFF).to_bytes(3, "big")
            body += b"\x00" * (step - 6)
        frame = (b"\x7f\x7f\x7f" + b"\x00" * 5 + bytes(body)).ljust(512, b"\x00")
        frames.append(frame)
    hdr = struct.pack(">HBBI", hpsdr.METIS_SIGNATURE, hpsdr.PKT_USB,
                      hpsdr.EP6, seq)
    return hdr + frames[0] + frames[1]


def test_hpsdr_discovery_against_mock_radio():
    radio = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    radio.bind(("127.0.0.1", 0))
    radio.settimeout(5.0)
    port = radio.getsockname()[1]
    got = []

    def responder():
        pkt, addr = radio.recvfrom(1024)
        got.append(pkt)
        # <0xEFFE><status=2><mac 6B><ver=31 -> 3.1><boardId=1 Hermes>
        resp = struct.pack(">HB6sBB", 0xEFFE, 2, b"\x02\xaa\xbb\xcc\xdd\xee",
                           31, 1)
        radio.sendto(resp, addr)

    t = threading.Thread(target=responder, daemon=True)
    t.start()
    found = hpsdr.discover("127.0.0.1", port, timeout=1.0)
    t.join(timeout=5)
    radio.close()
    # request framing: 0xEFFE 0x02 + 60 zeros
    assert got and got[0][:3] == b"\xef\xfe\x02" and len(got[0]) == 63
    assert got[0][3:] == b"\x00" * 60
    assert len(found) == 1
    info = found[0]
    assert info.status == 2 and info.board_id == 1
    assert info.board_name == "Hermes"
    assert (info.ver_major, info.ver_minor) == (3, 1)
    assert info.mac == b"\x02\xaa\xbb\xcc\xdd\xee"


def test_hpsdr_source_against_mock_radio():
    radio = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    radio.bind(("127.0.0.1", 0))
    radio.settimeout(5.0)
    port = radio.getsockname()[1]

    rng = np.random.default_rng(7)
    n_per_pkt = 2 * (504 // 8)  # 126 samples/packet at 1 RX
    iq24 = rng.integers(-(1 << 23), 1 << 23, (2 * n_per_pkt, 2), np.int64) \
        .astype(np.int32)
    ctl_packets = []

    def radio_worker():
        # Collect start + initial control pages, then stream 2 EP6 packets.
        client = None
        deadline = 40
        while deadline:
            deadline -= 1
            pkt, addr = radio.recvfrom(2048)
            client = addr
            if pkt[2] == hpsdr.PKT_CONTROL and pkt[3] == 0x01:
                pass  # start
            elif pkt[2] == hpsdr.PKT_USB:
                ctl_packets.append(pkt)
                if len(ctl_packets) == 6:
                    break
        radio.sendto(_make_ep6_packet(0, iq24[:n_per_pkt]), client)
        radio.sendto(_make_ep6_packet(1, iq24[n_per_pkt:]), client)
        # absorb any paced EP2 uplink
        try:
            while True:
                radio.recvfrom(2048)
        except OSError:
            pass

    t = threading.Thread(target=radio_worker, daemon=True)
    t.start()
    src = hpsdr.HpsdrSource("127.0.0.1", port, samplerate=192000.0)
    try:
        src.tune(7.1e6)
        src.set_preamp(True)
        src.set_atten(10)
        src.start()
        iq = src.read(2 * n_per_pkt)
    finally:
        src.close()
    t.join(timeout=5)
    radio.close()

    # exact reference conversion: (s24 + 0.5) / (2^23 - 0.5)
    want = (iq24.astype(np.float32) + 0.5) / (8388608.0 - 0.5)
    np.testing.assert_allclose(iq.real, want[:, 0], atol=1e-7)
    np.testing.assert_allclose(iq.imag, want[:, 1], atol=1e-7)
    assert src.seq_losses == 0 and src.sync_losses == 0

    # Validate the EP2 control pages that were sent at start():
    pages = {}
    for pkt in ctl_packets:
        assert pkt[:4] == b"\xef\xfe\x01\x02"  # EP2
        for off in (8, 520):
            frame = pkt[off:off + 512]
            assert frame[:3] == b"\x7f\x7f\x7f"
            c = frame[3:8]
            pages[c[0] >> 1] = c
    assert set(pages) == set(range(12))
    # page 0: samplerate id 2 (192k), preamp bit C3[2], numRx/duplex in C4
    assert pages[0][1] & 3 == 2
    assert pages[0][3] & (1 << 2)
    assert pages[0][4] == (0 << 3) | (1 << 2)
    # pages 1 (TX NCO) and 2 (RX1 NCO) both carry 7.1 MHz big-endian
    assert struct.unpack(">I", pages[1][1:5])[0] == 7100000
    assert struct.unpack(">I", pages[2][1:5])[0] == 7100000
    # page 10: attenuator 10 dB with enable bit 6
    assert pages[10][4] == 10 | (1 << 6)


def test_hpsdr_rejects_bad_samplerate():
    with pytest.raises(ValueError, match="48000"):
        hpsdr.HpsdrSource.__new__(hpsdr.HpsdrSource).set_samplerate(100000)


def test_hermes_lite2_source_against_mock_radio():
    radio = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    radio.bind(("127.0.0.1", 0))
    radio.settimeout(5.0)
    port = radio.getsockname()[1]
    regs = {}

    rng = np.random.default_rng(8)
    si = rng.integers(-(1 << 23), 1 << 23, 126, np.int64).astype(np.int32)
    sq = rng.integers(-(1 << 23), 1 << 23, 126, np.int64).astype(np.int32)

    def radio_worker():
        client = None
        for _ in range(10):
            pkt, addr = radio.recvfrom(2048)
            client = addr
            if pkt[2] == hpsdr.PKT_USB and pkt[3] == hpsdr.EP2:
                frame = pkt[8:520]
                if frame[:3] == b"\x7f\x7f\x7f":
                    reg = frame[3] >> 1
                    regs[reg] = struct.unpack(">I", frame[4:8])[0]
            if len(regs) >= 3:
                break
        # one EP6 packet: 2 frames x 63 samples, layout I[3] Q[3] mic[2]
        frames = []
        for half in (range(0, 63), range(63, 126)):
            body = bytearray()
            for i in half:
                body += int(si[i] & 0xFFFFFF).to_bytes(3, "big")
                body += int(sq[i] & 0xFFFFFF).to_bytes(3, "big")
                body += b"\x00\x00"
            frames.append((b"\x7f\x7f\x7f" + b"\x00" * 5
                           + bytes(body)).ljust(512, b"\x00"))
        hdr = struct.pack(">HBBI", 0xEFFE, 0x01, 0x06, 0)
        radio.sendto(hdr + frames[0] + frames[1], client)

    t = threading.Thread(target=radio_worker, daemon=True)
    t.start()
    src = hpsdr.HermesLite2Source("127.0.0.1", port, samplerate=384000.0)
    try:
        src.start()
        src.tune(14.2e6)
        src.set_gain(20)
        iq = src.read(126)
    finally:
        src.close()
    t.join(timeout=5)
    radio.close()

    assert regs[0] == 3 << 24                     # 384 kHz rate id
    assert regs[src.REG_RX1_NCO] == 14200000      # RX1 NCO
    assert regs[src.REG_RX_LNA] == 20 | (1 << 6)  # LNA gain + marker bit
    # HL2 decode: s24 / 2^24, I->im Q->re (hermes.cpp:196-198)
    np.testing.assert_allclose(iq.real, sq.astype(np.float32) / 0x1000000,
                               atol=1e-7)
    np.testing.assert_allclose(iq.imag, si.astype(np.float32) / 0x1000000,
                               atol=1e-7)


def test_rfspace_source_against_mock_server():
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    received = []
    udp_ready = threading.Event()
    client_udp = []

    udp = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    udp.bind(("127.0.0.1", port))
    udp.settimeout(5.0)

    rng = np.random.default_rng(9)
    iq16 = rng.integers(-32768, 32768, 2 * 512).astype("<i2")

    def udp_worker():
        # NAT hole-punch byte tells us the client's UDP address.
        data, addr = udp.recvfrom(64)
        assert data == b"\x5A"
        client_udp.append(addr)
        udp_ready.set()

    def tcp_worker():
        conn, _ = srv.accept()
        conn.settimeout(5.0)
        # Expect PROD_ID request; answer with NetSDR id.
        hdr = conn.recv(2)
        raw = struct.unpack("<H", hdr)[0]
        assert raw >> 13 == rfs.MSG_REQ_CTRL_ITEM
        body = conn.recv((raw & 0x1FFF) - 2)
        assert struct.unpack("<H", body[:2])[0] == rfs.ITEM_PROD_ID
        payload = struct.pack("<HI", rfs.ITEM_PROD_ID, rfs.DEV_ID_NET_SDR)
        conn.sendall(struct.pack("<H", (2 + len(payload))
                                 | (rfs.MSG_SET_CTRL_ITEM_RESP << 13)) + payload)
        # Collect the default-config messages + our explicit commands.
        try:
            while True:
                hdr = conn.recv(2)
                if len(hdr) < 2:
                    break
                raw = struct.unpack("<H", hdr)[0]
                size = raw & 0x1FFF
                body = conn.recv(size - 2) if size > 2 else b""
                received.append((raw >> 13, body))
                # After the START command, stream one UDP data packet.
                if len(body) >= 3 and struct.unpack("<H", body[:2])[0] == \
                        rfs.ITEM_STATE and body[3:4] == bytes([rfs.STATE_RUN]):
                    udp_ready.wait(5)
                    payload = iq16.tobytes()
                    pkt = struct.pack("<HH", (4 + len(payload)) & 0x1FFF
                                      | (rfs.MSG_DATA_ITEM_0 << 13), 0) + payload
                    udp.sendto(pkt, client_udp[0])
        except OSError:
            pass
        conn.close()

    tu = threading.Thread(target=udp_worker, daemon=True)
    tt = threading.Thread(target=tcp_worker, daemon=True)
    tu.start()
    tt.start()

    src = rfs.RFspaceSource("127.0.0.1", port)
    try:
        assert src.device_id == rfs.DEV_ID_NET_SDR
        assert src.device_name == "NetSDR"
        src.tune(14.1e6)
        src.set_gain(-10)
        src.start()
        iq = src.read(512)
    finally:
        src.close()
    tt.join(timeout=5)
    srv.close()
    udp.close()

    want = iq16.astype(np.float32) / 32768.0
    np.testing.assert_allclose(iq.view(np.float32), want, atol=1e-7)

    # Wire-level checks on what the client sent:
    sets = [b for t, b in received if t == rfs.MSG_SET_CTRL_ITEM]

    def find(item):
        return [b for b in sets if struct.unpack("<H", b[:2])[0] == item]

    # default config: stop + 1.2288 Msps + 8.83 MHz + gain 0 + port 1
    st = find(rfs.ITEM_STATE)
    assert st[0][2:] == bytes([0, rfs.STATE_IDLE, 0, 0])
    sr = find(rfs.ITEM_IQ_SAMP_RATE)[0]
    assert sr[2] == 0 and struct.unpack("<I", sr[3:7])[0] == 1228800
    fq = find(rfs.ITEM_NCO_FREQUENCY)
    assert fq[0][2] == 0 and int.from_bytes(fq[0][3:8], "little") == 8830000
    # our explicit tune
    assert int.from_bytes(fq[1][3:8], "little") == 14100000
    gn = find(rfs.ITEM_RF_GAIN)
    assert struct.unpack("<b", gn[1][3:4])[0] == -10
    # start command ran complex 16-bit (close() appends a final stop)
    assert bytes([rfs.SAMP_FORMAT_COMPLEX, rfs.STATE_RUN,
                  rfs.SAMP_DEPTH_16BIT, 0]) in [b[2:] for b in st]


def test_rfspace_valid_sample_rates():
    rates = rfs.valid_sample_rates(rfs.DEV_ID_NET_SDR)
    assert rates[0] == 80000000 // 100 and rates[-1] >= 32000
    assert all(a // 2 == b for a, b in zip(rates, rates[1:]))
    cloud = rfs.valid_sample_rates(rfs.DEV_ID_CLOUD_IQ)
    assert cloud[0] == 122880000 // 100


def test_spectran_http_source_against_mock_server():
    import json as json_mod

    from sdrpp_tpu.io.spectran import SpectranHTTPSource

    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    rng = np.random.default_rng(11)
    iq = (rng.standard_normal(2 * 1024) * 0.2).astype("<f4")
    control_reqs = []

    def make_chunk(payload: bytes, start: int, end: int) -> bytes:
        meta = json_mod.dumps({"startFrequency": start, "endFrequency": end,
                               "sampleFrequency": end - start}).encode()
        body = meta + b"\n" + b"\x1e" + payload
        return f"{len(body):x}\r\n".encode() + body + b"\r\n"

    def server():
        # stream connection
        conn, _ = srv.accept()
        conn.settimeout(5.0)
        req = b""
        while b"\r\n\r\n" not in req:
            req += conn.recv(4096)
        assert b"GET /stream?format=float32" in req
        conn.sendall(b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n")
        conn.sendall(make_chunk(iq[:1024].tobytes(), 99_000_000, 101_000_000))
        conn.sendall(make_chunk(iq[1024:].tobytes(), 99_000_000, 101_000_000))
        # control connection (tune)
        ctrl, _ = srv.accept()
        ctrl.settimeout(5.0)
        creq = b""
        while b"\r\n\r\n" not in creq:
            creq += ctrl.recv(4096)
        head, body = creq.split(b"\r\n\r\n", 1)
        clen = int([ln.split(b":")[1] for ln in head.split(b"\r\n")
                    if ln.lower().startswith(b"content-length")][0])
        while len(body) < clen:
            body += ctrl.recv(4096)
        control_reqs.append((head, body))
        ctrl.sendall(b"HTTP/1.1 200 OK\r\nContent-Length: 0\r\n\r\n")
        ctrl.close()
        try:
            conn.recv(1)
        except OSError:
            pass
        conn.close()

    t = threading.Thread(target=server, daemon=True)
    t.start()
    src = SpectranHTTPSource("127.0.0.1", port)
    try:
        changes = []
        src.on_samplerate_changed = changes.append
        got = src.read(1024)
        # metadata: samplerate = end - start, center = midpoint
        assert src.samplerate == 2_000_000.0
        assert src.center_freq == 100_000_000.0
        assert changes == [2_000_000.0]
        np.testing.assert_array_equal(got.view("<f4"), iq[:2048])
        src.tune(144_000_000)
    finally:
        src.close()
        srv.close()
    t.join(timeout=5)

    head, body = control_reqs[0]
    assert head.startswith(b"PUT /control")
    payload = json_mod.loads(body)
    assert payload == {"frequencyCenter": 144_000_000,
                       "frequencySpan": 2_000_000, "type": "capture"}
