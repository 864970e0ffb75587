"""Analog TV (ATV) decoding blocks: line sync + chroma PLL.

Reference: decoder_modules/atv_decoder/src/{linesync.h, chroma_pll.h}.

LineSync locks a phase-control loop to the horizontal sync tips: 720
samples per line are emitted through the fractional polyphase interpolator;
at each line boundary the timing error is the difference between the
average levels of the two halves of the sync region (linesync.h:109-135 —
left = samples [703..719]+[0..26], right = [27..70], only when both sit
below the sync level).

TPU formulation: within a line the loop error is zero, so sample positions
advance UNIFORMLY by ``freq`` — a whole line is one vectorized 720-point
fractional-delay gather; only the per-line error update is sequential
(a scan over lines, not samples).

ChromaPLL (chroma_pll.h:22-52) locks to the color burst window of each
line and free-runs outside it; the free-run sections are vectorized mixes,
the burst is a short sequential scan.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.clock_recovery import _interp_bank
from ..ops.scans import FL_PI, _critically_damped, _normalize_phase
from ..utils.blocks import Block

__all__ = ["LineSync", "ChromaPLL"]

LINE_LEN = 720


class LineSync(Block):
    """Horizontal line synchronizer -> (lines[max_lines, 720], valid)."""

    def __init__(self, omega: float, omega_gain: float = 1e-6,
                 mu_gain: float = 0.01, omega_rel_limit: float = 0.01,
                 sync_level: float = -0.03, sync_bias: float = 0.0,
                 interp_phase_count: int = 128, interp_tap_count: int = 8):
        self.omega = float(omega)  # samples per output sample
        self.mu_gain = np.float32(mu_gain)
        self.omega_gain = np.float32(omega_gain)
        self.min_freq = np.float32(omega * (1.0 - omega_rel_limit))
        self.max_freq = np.float32(omega * (1.0 + omega_rel_limit))
        self.sync_level = np.float32(sync_level)
        self.sync_bias = np.float32(sync_bias)
        self.phase_count = int(interp_phase_count)
        self.tap_count = int(interp_tap_count)
        self.bank = _interp_bank(self.phase_count, self.tap_count)

    def max_lines(self, n: int) -> int:
        return int(n / (LINE_LEN * float(self.min_freq))) + 2

    def init_state(self):
        return {
            "tail": jnp.zeros(self.tap_count - 1, jnp.float32),
            "pos": jnp.zeros((), jnp.float32),   # fractional position in block
            "freq": jnp.full((), self.omega, jnp.float32),
            "locked": jnp.zeros((), jnp.bool_),
        }

    def __call__(self, state, x):
        n = x.shape[-1]
        max_lines = self.max_lines(n)
        buf = jnp.concatenate([state["tail"], x])
        bank = jnp.asarray(self.bank)
        ks = jnp.arange(LINE_LEN, dtype=jnp.float32)
        taps_off = jnp.arange(self.tap_count, dtype=jnp.int32)

        def step(carry, _):
            pos, freq, locked = carry
            active = pos + LINE_LEN * freq < n

            # Vectorized fractional interpolation of one 720-sample line.
            p = pos + ks * freq                       # [720]
            ip = jnp.floor(p).astype(jnp.int32)
            mu = p - jnp.floor(p)
            ph = jnp.clip((mu * self.phase_count).astype(jnp.int32), 0,
                          self.phase_count - 1)
            idx = jnp.clip(ip[:, None], 0, n - 1) + taps_off[None, :]
            windows = buf[idx]                        # [720, taps]
            line = jnp.sum(windows * bank[ph], axis=-1)

            # Sync error from the wrap-around sync region (linesync.h:113-135)
            left = (jnp.sum(line[LINE_LEN - 17:]) + jnp.sum(line[:27])) / 44.0
            right = jnp.sum(line[27: 54 + 17]) / 44.0
            sync_ok = (left < self.sync_level) & (right < self.sync_level)
            error = jnp.where(sync_ok, left + self.sync_bias - right, 0.0)
            new_locked = sync_ok

            new_freq = jnp.clip(freq + self.omega_gain * error,
                                self.min_freq, self.max_freq)
            new_pos = pos + (LINE_LEN - 1) * freq + new_freq + self.mu_gain * error

            sel = lambda a, b: jnp.where(active, a, b)
            return (sel(new_pos, pos), sel(new_freq, freq),
                    sel(new_locked, locked)), \
                (jnp.where(active, line, 0.0), active)

        carry0 = (state["pos"], state["freq"], state["locked"])
        (pos_f, freq_f, locked_f), (lines, valid) = jax.lax.scan(
            step, carry0, None, length=max_lines)
        new_state = {
            "tail": buf[n:],
            "pos": pos_f - n,
            "freq": freq_f,
            "locked": locked_f,
        }
        return new_state, (lines, valid)


class ChromaPLL(Block):
    """Color-burst PLL over framed lines.

    Input: complex chroma lines [L, line_len]; the PLL advances freely
    outside the burst window [burst_start, burst_end) and phase-locks to
    the burst with error normalize(angle(v) - ref_phase)
    (chroma_pll.h:22-52). Output: lines mixed down by the tracked phase.
    """

    def __init__(self, bandwidth: float, line_len: int, burst_start: int,
                 burst_end: int, ref_phase: float = 0.0,
                 init_freq: float = 0.0, min_freq: float = -float(FL_PI),
                 max_freq: float = float(FL_PI)):
        self.alpha, self.beta = _critically_damped(bandwidth)
        self.line_len = int(line_len)
        self.burst_start = int(burst_start)
        self.burst_end = int(burst_end)
        self.ref_phase = np.float32(ref_phase)
        self.init_freq = np.float32(init_freq)
        self.min_freq = np.float32(min_freq)
        self.max_freq = np.float32(max_freq)

    def init_state(self):
        return {"phase": jnp.zeros((), jnp.float32),
                "freq": jnp.full((), self.init_freq, jnp.float32)}

    def _mix(self, phase0, freq, seg):
        k = jnp.arange(seg.shape[-1], dtype=jnp.float32)
        ph = phase0 + k * freq
        out = seg * jax.lax.complex(jnp.cos(-ph), jnp.sin(-ph))
        return ph[-1] + freq if seg.shape[-1] else phase0, out

    def __call__(self, state, lines):
        bs, be = self.burst_start, self.burst_end

        def line_step(carry, line):
            phase, freq = carry
            # Pre-burst free run
            phase1, pre = self._mix(phase, freq, line[:bs])

            # Burst: sequential lock
            def burst_step(c, v):
                ph, fr = c
                out = v * jax.lax.complex(jnp.cos(-ph), jnp.sin(-ph))
                err = _normalize_phase(jnp.arctan2(out.imag, out.real)
                                       - self.ref_phase)
                fr = jnp.clip(fr + self.beta * err, self.min_freq, self.max_freq)
                ph = ph + fr + self.alpha * err
                ph = _normalize_phase(jnp.mod(ph + FL_PI, 2 * FL_PI) - FL_PI)
                return (ph, fr), out

            (phase2, freq2), burst = jax.lax.scan(burst_step, (phase1, freq),
                                                  line[bs:be])
            # Post-burst free run
            phase3, post = self._mix(phase2, freq2, line[be:])
            phase3 = _normalize_phase(jnp.mod(phase3 + FL_PI, 2 * FL_PI) - FL_PI)
            return (phase3, freq2), jnp.concatenate([pre, burst, post])

        (ph_f, fr_f), out = jax.lax.scan(line_step,
                                         (state["phase"], state["freq"]), lines)
        return {"phase": ph_f, "freq": fr_f}, out
