"""KG-STV (slow-scan TV) decoder.

Reimplements the reference's kg_sstv_decoder module
(decoder_modules/kg_sstv_decoder/src/kg_sstv_dsp.h):

  FloatFMDemod(dev 300 Hz) -> RRC FIR (31 taps, alpha 0.7, 1200 baud)
  -> MM clock recovery (1e-6 / 0.01 / 0.01) -> Deframer:
     63-bit syncword match (<=4 errors, rewind-on-fail), then 108 soft
     symbols -> descramble (inversion mask) -> K=7 {0o155,0o117} soft
     Viterbi -> 7-byte frame (kg_sstv_dsp.h:141-226).

The reference module is an acknowledged WIP (it dumps raw 7-byte frames
to kgsstv_out.bin); this port reproduces that frame-extraction layer.
Deviation: the reference's sync matcher only counts an error when the
symbol is positive where the syncword expects 0 (kg_sstv_dsp.h:148) —
it never penalizes the opposite polarity, so it can false-lock on long
1-runs. Here both polarities are checked against the same <=4-error
budget with the same rewind behavior.
"""

from __future__ import annotations

import numpy as np

from ..ops.fec import ConvCode

__all__ = ["KGSSTVDeframer", "KGSSTVDecoder", "SYNC_WORD", "SCRAMBLING",
           "DEVIATION", "BAUDRATE", "RRC_ALPHA", "FRAME_SYMBOLS"]

DEVIATION = 300.0
BAUDRATE = 1200.0
RRC_ALPHA = 0.7
FRAME_SYMBOLS = 108
ENCODED_BITS = 124       # kg_sstv_dsp.h:196 decode length (62 trellis sets)
MAX_SYNC_ERRORS = 4

SYNC_WORD = np.array([
    0, 0, 0, 0, 1, 1, 1, 0, 0, 0, 0, 1, 0, 0, 1, 0,
    0, 0, 1, 1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 0, 1, 0,
    1, 1, 1, 0, 1, 1, 1, 1, 0, 0, 1, 1, 0, 0, 0, 1,
    0, 1, 0, 1, 0, 0, 1, 1, 1, 1, 1, 1, 0, 1, 0], np.uint8)

SCRAMBLING = np.array([
    1, 1, 1, 0, 1, 1, 0, 0, 1, 1, 0, 0, 0, 1, 0, 0,
    1, 0, 0, 1, 1, 1, 0, 0, 1, 1, 1, 1, 1, 0, 0, 1,
    0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 1, 0, 1, 0, 1, 0,
    1, 0, 0, 1, 1, 0, 1, 1, 0, 1, 0, 0, 1, 0, 1, 0,
    0, 0, 0, 1, 0, 1, 1, 0, 0, 0, 0, 1, 1, 0, 0, 1,
    0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 0, 1, 1, 0, 1, 1,
    1, 0, 1, 1, 1, 1, 0, 0, 0, 1, 1, 1, 0, 1, 0, 0,
    0, 1, 0, 1, 0, 1, 1, 1, 0, 0, 0, 0, 0, 0, 1], np.uint8)

# rate-1/2 K=7 Voyager polynomials {0o155, 0o117} (kg_sstv_dsp.h:57)
_CONV = ConvCode(2, 7, (0o155, 0o117))


class KGSSTVDeframer:
    """Soft-symbol syncword deframer + Viterbi (kg_sstv_dsp.h Deframer).

    process(symbols) -> list of 7-byte frames.
    """

    def __init__(self):
        self._buf = np.zeros(0, np.float32)

    def process(self, symbols: np.ndarray) -> list[bytes]:
        buf = np.concatenate([self._buf,
                              np.asarray(symbols, np.float32).ravel()])
        nsync = len(SYNC_WORD)
        frames: list[bytes] = []
        i = 0
        while len(buf) - i >= nsync + FRAME_SYMBOLS:
            window = buf[i:i + nsync]
            errors = int(np.count_nonzero((window > 0.0)
                                          != SYNC_WORD.astype(bool)))
            if errors > MAX_SYNC_ERRORS:
                i += 1
                continue
            soft = buf[i + nsync:i + nsync + FRAME_SYMBOLS]
            # soft bits 0..255 (kg_sstv_dsp.h:177) + inversion descramble
            conv = np.clip((soft + 1.0) * 128.0, 0.0, 255.0)
            mask = SCRAMBLING[:FRAME_SYMBOLS].astype(bool)
            conv[mask] = 255.0 - conv[mask]
            # Pad to the reference's 124-bit decode length: it reads 16
            # bits past the 108 captured symbols out of stale buffer
            # memory (kg_sstv_dsp.h:196 vs :177) — i.e. the last two
            # payload bits are effectively unprotected (arbitrary in the
            # output, as in the reference). Neutral erasures here instead
            # of stale bytes.
            conv = np.concatenate(
                [conv, np.full(ENCODED_BITS - FRAME_SYMBOLS, 128.0)])
            bits = np.asarray(_CONV.decode_soft_np(conv.astype(np.float32),
                                                flush_bits=6))
            frames.append(np.packbits(bits[:56]).tobytes())
            i += nsync + FRAME_SYMBOLS
        self._buf = buf[i:]
        return frames

    @staticmethod
    def encode_frame(data: bytes) -> np.ndarray:
        """TX oracle: 7 bytes -> sync + 108 scrambled symbols (+-1)."""
        assert len(data) == 7
        enc_bytes = _CONV.encode(np.frombuffer(data, np.uint8))  # 128 bits
        bits = np.unpackbits(np.frombuffer(enc_bytes, np.uint8))
        bits = bits[:FRAME_SYMBOLS]
        sym = bits.astype(np.float32) * 2.0 - 1.0
        mask = SCRAMBLING[:FRAME_SYMBOLS].astype(bool)
        sym[mask] = -sym[mask]
        sync_sym = SYNC_WORD.astype(np.float32) * 2.0 - 1.0
        return np.concatenate([sync_sym, sym])


class KGSSTVDecoder:
    """End-to-end KG-STV frame extractor (kg_sstv_dsp.h Decoder):
    FM discriminator -> RRC -> MM recovery -> deframer.

    process(iq) -> list of 7-byte frames."""

    def __init__(self, samplerate: float):
        import jax
        import jax.numpy as jnp

        from ..ops import taps as taps_mod
        from ..ops.clock_recovery_pallas import MMClockRecoveryPallas as \
        MMClockRecovery  # Pallas scalar kernel on TPU
        from ..ops.fir import FIR
        from ..ops.fm import Quadrature

        self.demod = Quadrature(DEVIATION, samplerate)
        rrc = taps_mod.root_raised_cosine_rate(31, RRC_ALPHA, BAUDRATE,
                                               samplerate)
        self.rrc = FIR(rrc, dtype=jnp.float32)
        self.recov = MMClockRecovery(samplerate / BAUDRATE, 1e-6, 0.01,
                                     0.01, complex_input=False)
        from ..utils.iq import device_state
        self.deframer = KGSSTVDeframer()
        self._state = device_state(lambda: {
            "demod": self.demod.init_state(),
            "rrc": self.rrc.init_state(),
            "recov": self.recov.init_state()})

        def _step(st, xs):
            import jax as _jax
            x = _jax.lax.complex(xs[0], xs[1])
            ds, y = self.demod(st["demod"], x)
            fs_, y = self.rrc(st["rrc"], y)
            ms, (sym, valid) = self.recov(st["recov"], y)
            return {"demod": ds, "rrc": fs_, "recov": ms}, sym, valid

        self._step = jax.jit(_step)

    def process(self, iq: np.ndarray) -> list[bytes]:
        import jax.numpy as jnp

        from ..utils.iq import split_iq

        self._state, sym, valid = self._step(self._state,
                                             jnp.asarray(split_iq(iq)))
        keep = np.asarray(valid).astype(bool)  # mask, not prefix
        return self.deframer.process(np.asarray(sym)[keep])
