"""Pallas int4 kernel vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.ops.pallas_int4 import int4_matmul, int4_matmul_reference
from fish_speech_tpu.ops.quant import quantize_int4


@pytest.mark.parametrize("b,i,o,g", [(1, 256, 512, 64), (4, 512, 256, 128),
                                     (2, 256, 384, 32)])
def test_kernel_matches_reference(b, i, o, g):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, i)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(i, o)).astype(np.float32) * 0.1)
    qw = quantize_int4(w, group_size=g)
    want = np.asarray(int4_matmul_reference(x, qw["p"], qw["gs"]))
    got = np.asarray(int4_matmul(x, qw["p"], qw["gs"], interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_kernel_bf16_inputs():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32) * 0.1)
    qw = quantize_int4(w, group_size=64)
    got = np.asarray(int4_matmul(x, qw["p"], qw["gs"], interpret=True)).astype(np.float32)
    want = np.asarray(x.astype(jnp.float32) @ w)
    rel = np.abs(got - want).mean() / np.abs(want).mean()
    assert rel < 0.25  # int4 noise + bf16
