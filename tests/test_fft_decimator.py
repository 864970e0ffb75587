"""FFTPowerDecimator: the /2^k cascade folded into one batched FFT
(VERDICT r4 #2). Must match the time-domain PowerDecimator (the
reference plan cascade, core/src/dsp/multirate/power_decimator.h:8-119)
sample-for-sample, including carried state across block seams."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdrpp_tpu.ops.fir import DecimatingFIR
from sdrpp_tpu.ops.resample import (FFTPowerDecimator, PowerDecimator,
                                    equivalent_decim_taps)


def test_equivalent_taps_match_cascade_impulse():
    """h_eq IS the cascade's impulse response: feeding a unit impulse
    through the time-domain stages and through DecimatingFIR(h_eq, R)
    gives identical outputs."""
    r = 64
    h = equivalent_decim_taps(r)
    n = ((h.shape[0] * 2) // r + 1) * r
    x = np.zeros(n, np.complex64)
    x[0] = 1.0
    pd = PowerDecimator(r)
    df = DecimatingFIR(h, r)
    _, y1 = pd(pd.init_state(), jnp.asarray(x))
    _, y2 = df(df.init_state(), jnp.asarray(x))
    assert np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-6), \
        np.abs(np.asarray(y1) - np.asarray(y2)).max()


@pytest.mark.parametrize("ratio,fft_len", [(256, 1 << 17), (64, 1 << 15),
                                           (256, 1 << 16)])
def test_fft_decimator_matches_cascade(ratio, fft_len):
    fd = FFTPowerDecimator(ratio, fft_len=fft_len)
    pd = PowerDecimator(ratio)
    n = 2 * fd.block_multiple  # two segments per block
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(2 * n) + 1j * rng.standard_normal(2 * n)) \
        .astype(np.complex64)

    sf, sp = fd.init_state(), pd.init_state()
    outs_f, outs_p = [], []
    for blk in (x[:n], x[n:]):  # two blocks: seams exercise the carry
        xb = jnp.asarray(blk)
        sf, yf = fd(sf, xb)
        # PowerDecimator needs n % ratio == 0 only
        sp, yp = pd(sp, xb)
        outs_f.append(np.asarray(yf))
        outs_p.append(np.asarray(yp))
    yf = np.concatenate(outs_f)
    yp = np.concatenate(outs_p)
    assert yf.shape == yp.shape
    scale = np.abs(yp).max()
    assert np.allclose(yf, yp, atol=5e-5 * max(scale, 1.0)), \
        np.abs(yf - yp).max()


def test_fft_decimator_lead_axes():
    fd = FFTPowerDecimator(16, fft_len=1 << 14, lead_shape=(3,))
    pd = PowerDecimator(16, lead_shape=(3,))
    n = fd.block_multiple
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))) \
        .astype(np.complex64)
    _, yf = fd(fd.init_state(), jnp.asarray(x))
    _, yp = pd(pd.init_state(), jnp.asarray(x))
    assert np.asarray(yf).shape == np.asarray(yp).shape == (3, n // 16)
    assert np.allclose(np.asarray(yf), np.asarray(yp), atol=5e-5)


def test_fft_decimator_rejects_bad_block():
    fd = FFTPowerDecimator(256, fft_len=1 << 17)
    with pytest.raises(AssertionError):
        fd(fd.init_state(), jnp.zeros(1000, jnp.complex64))


def test_fft_decimator_under_jit_two_blocks_continuous():
    """Jitted, multi-block: concatenated output equals one-shot output
    (carry correctness), and the payload-sized block multiple holds."""
    fd = FFTPowerDecimator(32, fft_len=1 << 14)
    n = fd.block_multiple
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(4 * n) + 1j * rng.standard_normal(4 * n)) \
        .astype(np.complex64)
    step = jax.jit(fd)
    st = fd.init_state()
    parts = []
    for i in range(4):
        st, y = step(st, jnp.asarray(x[i * n:(i + 1) * n]))
        parts.append(np.asarray(y))
    blockwise = np.concatenate(parts)
    st2 = fd.init_state()
    fd2 = FFTPowerDecimator(32, fft_len=1 << 14)
    # one-shot with a bigger (4-segment) block
    _, y_all = fd2(st2, jnp.asarray(x))
    assert np.allclose(blockwise, np.asarray(y_all), atol=5e-5)
