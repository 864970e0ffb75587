"""Split-f32 IQ transfer helpers (utils/iq.py, the axon c64 workaround)."""

import jax
import jax.numpy as jnp
import numpy as np

from sdrpp_tpu.utils.iq import complex_input, split_iq


def test_split_iq_roundtrip():
    rng = np.random.default_rng(0)
    iq = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)
          ).astype(np.complex64)
    s = split_iq(iq)
    assert s.shape == (2, 1000) and s.dtype == np.float32
    np.testing.assert_array_equal(s[0] + 1j * s[1], iq)


def test_complex_input_equivalence():
    from sdrpp_tpu.ops.mix import FrequencyXlator

    rng = np.random.default_rng(1)
    iq = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
          ).astype(np.complex64)
    b = FrequencyXlator(10000.0, 96000.0)
    st, y_direct = jax.jit(b)(b.init_state(), jnp.asarray(iq))
    st2, y_split = jax.jit(complex_input(b))(
        b.init_state(), jnp.asarray(split_iq(iq)))
    np.testing.assert_array_equal(np.asarray(y_direct), np.asarray(y_split))
    np.testing.assert_array_equal(np.asarray(st), np.asarray(st2))
