"""KG-STV decoder (decoder_modules/kg_sstv_decoder)."""

import numpy as np

from sdrpp_tpu.decoders import kg_sstv as kg


def _frame_bytes(rng):
    return bytes(rng.integers(0, 256, 7).astype(np.uint8))


def _mask(frames):
    """The reference's 124-bit decode reads 16 bits past the 108 captured
    symbols, so the final two payload bits are unprotected/arbitrary (see
    kg_sstv.py docstring) — compare frames with those bits masked."""
    return [f[:6] + bytes([f[6] & 0b11111100]) for f in frames]


def test_deframer_symbol_roundtrip():
    rng = np.random.default_rng(0)
    frames = [_frame_bytes(rng) for _ in range(3)]
    sym = np.concatenate(
        [rng.normal(0, 0.3, 40).astype(np.float32)]
        + [kg.KGSSTVDeframer.encode_frame(f) for f in frames]
        + [rng.normal(0, 0.3, 200).astype(np.float32)])
    d = kg.KGSSTVDeframer()
    got = []
    for i in range(0, len(sym), 97):  # odd block size to cross boundaries
        got.extend(d.process(sym[i:i + 97]))
    assert _mask(got) == _mask(frames)


def test_deframer_tolerates_sync_errors_and_soft_noise():
    rng = np.random.default_rng(1)
    frame = _frame_bytes(rng)
    sym = kg.KGSSTVDeframer.encode_frame(frame)
    # flip 4 sync bits (the reference's error budget) + add symbol noise
    for p in rng.choice(len(kg.SYNC_WORD), 4, replace=False):
        sym[p] = -sym[p]
    sym += rng.normal(0, 0.25, len(sym)).astype(np.float32)
    got = kg.KGSSTVDeframer().process(
        np.concatenate([sym, np.zeros(8, np.float32)]))
    assert _mask(got) == _mask([frame])


def test_kg_sstv_end_to_end_fm():
    rng = np.random.default_rng(2)
    frames = [_frame_bytes(rng) for _ in range(4)]
    sym = np.concatenate(
        [(rng.integers(0, 2, 400) * 2.0 - 1.0).astype(np.float32)]  # PN lock
        + [kg.KGSSTVDeframer.encode_frame(f) for f in frames]
        + [np.zeros(50, np.float32)])
    fs = 12000.0
    # RRC-shape the symbol stream (matched to the RX RRC) and calibrate
    # the TX x RX cascade gain so symbol instants sit at +-1.
    import jax.numpy as jnp

    from sdrpp_tpu.ops.resample import RRCInterpolator
    from sdrpp_tpu.ops.taps import root_raised_cosine_rate
    shaper = RRCInterpolator(kg.BAUDRATE, fs, kg.RRC_ALPHA,
                             rrc_tap_count=31, dtype=jnp.float32)
    pad = (-len(sym)) % shaper.block_multiple
    sym = np.concatenate([sym, np.zeros(pad, np.float32)])
    _, wave = shaper(shaper.init_state(), jnp.asarray(sym))
    wave = np.asarray(wave, np.float64)
    nimp = 64 + (-64) % shaper.block_multiple
    imp = np.zeros(nimp, np.float32)
    imp[32] = 1.0
    _, imp_shaped = shaper(shaper.init_state(), jnp.asarray(imp))
    rx = root_raised_cosine_rate(31, kg.RRC_ALPHA, kg.BAUDRATE, fs)
    cascade = np.convolve(np.asarray(imp_shaped, np.float64), rx)
    wave /= np.max(np.abs(cascade))
    n = len(wave)
    phase = np.cumsum(2 * np.pi * kg.DEVIATION * wave / fs)
    iq = np.exp(1j * phase).astype(np.complex64)
    iq += (rng.normal(0, 0.01, n) + 1j * rng.normal(0, 0.01, n)
           ).astype(np.complex64)

    dec = kg.KGSSTVDecoder(fs)
    got = []
    bs = 6000
    iq = np.concatenate(  # pad so the chunk loop covers the whole capture
        [iq, np.zeros((-len(iq)) % bs, np.complex64)])
    for i in range(0, len(iq), bs):
        got.extend(dec.process(iq[i:i + bs]))
    assert _mask(got) == _mask(frames)
