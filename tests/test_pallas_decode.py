"""Flash-decode kernel vs jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.ops.pallas_decode import (
    flash_decode_attention,
    flash_decode_reference,
)


@pytest.mark.parametrize("lengths", [[5, 200], [256, 1], [513, 700]])
def test_flash_decode_matches_reference(lengths):
    rng = np.random.default_rng(0)
    L, B, S, HKV, GP, D = 2, 2, 768, 2, 8, 64
    q = jnp.asarray(rng.normal(size=(B, HKV, GP, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(L, B, S, HKV, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, B, S, HKV, D)).astype(np.float32))
    lens = jnp.asarray(lengths, jnp.int32)
    for layer in range(L):
        want = np.asarray(flash_decode_reference(q, k, v, layer, lens))
        got = np.asarray(
            flash_decode_attention(q, k, v, jnp.int32(layer), lens,
                                   block_s=256, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3,
                                   err_msg=f"layer {layer}")


def test_flash_decode_ignores_garbage_past_length():
    rng = np.random.default_rng(1)
    L, B, S, HKV, GP, D = 1, 1, 512, 1, 8, 64
    q = jnp.asarray(rng.normal(size=(B, HKV, GP, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(L, B, S, HKV, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, B, S, HKV, D)).astype(np.float32))
    lens = jnp.asarray([100], jnp.int32)
    out1 = np.asarray(
        flash_decode_attention(q, k, v, jnp.int32(0), lens, interpret=True)
    )
    k2 = k.at[:, :, 100:].set(99.0)
    v2 = v.at[:, :, 100:].set(-99.0)
    out2 = np.asarray(
        flash_decode_attention(q, k2, v2, jnp.int32(0), lens, interpret=True)
    )
    np.testing.assert_allclose(out1, out2, atol=1e-5)
