"""Pallas Viterbi ACS kernel equivalence (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdrpp_tpu.ops.fec import CONV_R12_7, CONV_R12_9, ConvCode
from sdrpp_tpu.ops.fec_pallas import decode_soft_tpu


@pytest.mark.parametrize("order,polys", [(7, CONV_R12_7), (9, CONV_R12_9)])
def test_pallas_acs_matches_xla(order, polys):
    rng = np.random.default_rng(order)
    cc = ConvCode(2, order, polys)
    msg = rng.integers(0, 256, 48).astype(np.uint8)
    enc = cc.encode(msg)
    nbits = cc.encode_len_bits(len(msg))
    soft = np.unpackbits(enc)[:nbits].astype(np.float32) * 255
    flip = rng.choice(nbits, nbits // 40, replace=False)
    soft[flip] = 255 - soft[flip]
    ref = np.asarray(cc.decode_soft(jnp.asarray(soft)))
    pal = np.asarray(decode_soft_tpu(cc, jnp.asarray(soft), interpret=True))
    np.testing.assert_array_equal(ref, pal)
    # And both recover the message.
    dec = np.packbits(pal[: (len(pal) // 8) * 8])
    np.testing.assert_array_equal(dec[: len(msg)], msg)
