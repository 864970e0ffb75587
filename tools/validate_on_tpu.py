"""End-to-end receive-chain validation on the CURRENT backend.

Drives synthetic modulated IQ through full public-API chains and checks
the demodulated output quality — the same checks as the verify skill,
but runnable on the real TPU (all transfers are axon-safe: split-f32
uploads, device-side state, float-plane readbacks).

Usage: python tools/validate_on_tpu.py [--cpu]
Prints one PASS/FAIL line per chain; exit code 0 iff all pass.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FAILURES = []


def check(name, ok, detail):
    print(f"{'PASS' if ok else 'FAIL'} {name}: {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def nfm_chain():
    import jax
    import jax.numpy as jnp

    from sdrpp_tpu.models.radio import RadioChannel
    from sdrpp_tpu.utils.iq import complex_input, device_state, split_iq

    fs, f_ch, f_aud = 960000.0, 123000.0, 1000.0
    n = 480000
    t = np.arange(n) / fs
    audio = np.sin(2 * np.pi * f_aud * t)
    iq = np.exp(1j * (2 * np.pi * f_ch * t
                      + np.cumsum(2 * np.pi * 5000.0 * audio / fs))
                ).astype(np.complex64)
    chan = RadioChannel("nfm", fs, offset=f_ch)
    block = (n // 2 // chan.block_multiple) * chan.block_multiple
    state = device_state(chan.init_state)
    step = jax.jit(complex_input(chan))
    outs = []
    for i in range(0, 2 * block, block):
        state, out = step(state, jnp.asarray(split_iq(iq[i:i + block])))
        outs.append(np.asarray(out[0] if isinstance(out, tuple) else out))
    y = np.concatenate(outs)[2000:].astype(np.float64)
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y)))) ** 2
    pk = int(np.argmax(spec[5:])) + 5
    f_pk = pk * 48000.0 / len(y)
    sig = spec[pk - 3:pk + 4].sum()
    snr = 10 * np.log10(sig / max(spec[5:].sum() - sig, 1e-12))
    check("NFM", abs(f_pk - f_aud) < 5 and snr > 25,
          f"tone {f_pk:.1f} Hz, SNR {snr:.1f} dB")


def wfm_stereo_chain():
    import jax
    import jax.numpy as jnp

    from sdrpp_tpu.models.radio import RadioChannel
    from sdrpp_tpu.utils.iq import complex_input, device_state, split_iq

    fs, n = 960000.0, 960000
    t = np.arange(n) / fs
    L = 0.8 * np.sin(2 * np.pi * 1000.0 * t)
    R = 0.8 * np.sin(2 * np.pi * 2000.0 * t)
    mpx = (0.45 * (L + R) + 0.45 * (L - R) * np.sin(2 * np.pi * 38000.0 * t)
           + 0.1 * np.sin(2 * np.pi * 19000.0 * t))
    iq = np.exp(1j * (2 * np.pi * 100000.0 * t
                      + np.cumsum(2 * np.pi * 75000.0 * mpx / fs))
                ).astype(np.complex64)
    chan = RadioChannel("wfm", fs, offset=100000.0, deemphasis=None)
    block = (240000 // chan.block_multiple) * chan.block_multiple
    state = device_state(chan.init_state)
    step = jax.jit(complex_input(chan))
    outs = []
    for i in range(0, (n // block) * block, block):
        state, out = step(state, jnp.asarray(split_iq(iq[i:i + block])))
        outs.append(np.asarray(out[0] if isinstance(out, tuple) else out))
    a = np.concatenate(outs, axis=0)

    def tone_power(x, f):
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
        k = int(round(f * len(x) / 48000.0))
        return spec[k - 3:k + 4].sum()

    Lr = a[4800:, 0].astype(np.float64)
    Rr = a[4800:, 1].astype(np.float64)
    sep_l = 10 * np.log10(tone_power(Lr, 1000.0)
                          / max(tone_power(Lr, 2000.0), 1e-12))
    sep_r = 10 * np.log10(tone_power(Rr, 2000.0)
                          / max(tone_power(Rr, 1000.0), 1e-12))
    check("WFM-stereo", sep_l > 20 and sep_r > 20,
          f"separation L {sep_l:.1f} dB / R {sep_r:.1f} dB")


def kg_sstv_chain():
    import jax.numpy as jnp

    from sdrpp_tpu.decoders import kg_sstv as kg
    from sdrpp_tpu.ops.resample import RRCInterpolator
    from sdrpp_tpu.ops.taps import root_raised_cosine_rate

    rng = np.random.default_rng(2)
    frames = []
    for _ in range(4):
        b = rng.integers(0, 256, 7).astype(np.uint8)
        b[6] &= 0xFC
        frames.append(bytes(b))
    sym = np.concatenate(
        [(rng.integers(0, 2, 400) * 2.0 - 1.0).astype(np.float32)]
        + [kg.KGSSTVDeframer.encode_frame(f) for f in frames]
        + [np.zeros(50, np.float32)])
    fs = 12000.0
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
    rxt = root_raised_cosine_rate(31, kg.RRC_ALPHA, kg.BAUDRATE, fs)
    wave /= np.max(np.abs(np.convolve(np.asarray(imp_shaped, np.float64),
                                      rxt)))
    iq = np.exp(1j * np.cumsum(2 * np.pi * kg.DEVIATION * wave / fs)
                ).astype(np.complex64)
    iq = np.concatenate([iq, np.zeros((-len(iq)) % 6000, np.complex64)])
    dec = kg.KGSSTVDecoder(fs)
    got = []
    for i in range(0, len(iq), 6000):
        got.extend(dec.process(iq[i:i + 6000]))
    ok = (len(got) == len(frames)
          and all(g[:6] == f[:6] and (g[6] & 0xFC) == (f[6] & 0xFC)
                  for g, f in zip(got, frames)))
    check("KG-STV", ok, f"{len(got)}/{len(frames)} frames decoded")


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    print(f"backend: {jax.default_backend()}", flush=True)
    nfm_chain()
    wfm_stereo_chain()
    kg_sstv_chain()
    print("ALL PASS" if not FAILURES else f"FAILURES: {FAILURES}")
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
