"""LRPT chain end-to-end: payload -> conv encode -> QPSK -> IQ @150k ->
MeteorDemod -> soft Viterbi -> payload; plus RS layer (config #5)."""

import numpy as np
import jax
import jax.numpy as jnp

from sdrpp_tpu.models.digital import MeteorDemod
from sdrpp_tpu.models.lrpt import (CCSDS_CONV_POLYS, LRPTDecoder,
                                   soft_s8_to_u8, symbols_to_soft_bits)
from sdrpp_tpu.ops.fec import ConvCode


def test_lrpt_full_chain_recovers_payload():
    rng = np.random.default_rng(0)
    dec = LRPTDecoder()
    conv = dec.conv

    payload = rng.integers(0, 256, 256).astype(np.uint8)
    enc = conv.encode(payload)
    nbits = conv.encode_len_bits(len(payload))
    bits = np.unpackbits(enc)[:nbits]
    if len(bits) % 2:
        bits = np.append(bits, 0)

    # Map coded bit pairs to QPSK: I = bit0, Q = bit1 (+-1/sqrt2 grey-ish).
    i = bits[0::2] * 2.0 - 1.0
    q = bits[1::2] * 2.0 - 1.0
    syms = ((i + 1j * q) / np.sqrt(2)).astype(np.complex64)

    # Upsample to 150 ksps at 72 ksym/s (NRZ hold at fractional sps).
    sps = 150000.0 / 72000.0
    n = int(len(syms) * sps)
    k = np.floor(np.arange(n) / sps).astype(int)
    iq = syms[np.clip(k, 0, len(syms) - 1)]
    iq = (iq + 0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))) \
        .astype(np.complex64)

    demod = MeteorDemod(costas_bandwidth=0.01, agc_rate=0.01)
    st, (rx_syms, valid) = jax.jit(demod)(demod.init_state(), jnp.asarray(iq))
    keep = np.asarray(valid).astype(bool)  # mask, not prefix
    rx = np.asarray(rx_syms)[keep]

    # The Costas locks with a 90-degree ambiguity and the timing loop emits
    # ~10 acquisition-transient symbols; search rotations x symbol starts at
    # the BIT level (a real LRPT decoder uses the 1ACFFC1D sync word).
    # Dropping `start` leading symbols drops `start` trellis steps, so the
    # decoded bitstream is the payload bits from index `start`.
    payload_bits = np.unpackbits(payload)
    recovered = False
    for rot in range(4):
        r = rx * np.exp(-1j * np.pi / 2 * rot)
        for start in range(0, 24):
            s8 = symbols_to_soft_bits(r[start:] * np.sqrt(2))
            soft = soft_s8_to_u8(s8)
            # The dropped leading symbols are acquisition-transient
            # insertions, so the remaining stream starts at coded bit 0.
            usable = min(len(soft), nbits)
            usable -= usable % 2
            decoded_bits = np.asarray(
                dec.conv.decode_soft(jnp.asarray(soft[:usable].astype(np.float32))))
            m = min(len(decoded_bits), len(payload_bits))
            if m > 1000 and np.array_equal(decoded_bits[:m], payload_bits[:m]):
                recovered = True
                break
        if recovered:
            break
    assert recovered, "payload not recovered under any rotation/alignment"


def test_rs_layer_batch():
    rng = np.random.default_rng(1)
    dec = LRPTDecoder()
    msgs = rng.integers(0, 256, (4, 223)).astype(np.uint8)
    blocks = np.stack([dec.rs.encode(m) for m in msgs])
    # corrupt up to 16 bytes in each
    for b in blocks:
        pos = rng.choice(255, 12, replace=False)
        b[pos] ^= rng.integers(1, 256, 12).astype(np.uint8)
    out, ok = dec.rs_decode_blocks(blocks)
    assert ok.all()
    np.testing.assert_array_equal(out, msgs)


def test_soft_bit_conventions():
    syms = np.array([1 + 1j, -1 - 1j, 1 - 1j], np.complex64)
    s8 = symbols_to_soft_bits(syms)
    assert s8.dtype == np.int8
    np.testing.assert_array_equal(s8, [84, 84, -84, -84, 84, -84])
    u8 = soft_s8_to_u8(s8)
    np.testing.assert_array_equal(u8, [212, 212, 44, 44, 212, 44])
