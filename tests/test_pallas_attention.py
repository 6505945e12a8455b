"""Flash-prefill kernel vs the einsum reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.ops.attention import gqa_attention
from fish_speech_tpu.ops.pallas_attention import flash_prefill_attention


def reference(q, k, v, offsets):
    b, t = q.shape[0], q.shape[1]
    i = jnp.arange(t)
    mask = (i[None, :] <= i[:, None])[None] & (
        i[None, None, :] >= offsets[:, None, None]
    )
    return gqa_attention(q, k, v, mask)


@pytest.mark.parametrize("b,t,h,hkv,d", [(1, 128, 4, 2, 64), (2, 256, 8, 4, 64)])
def test_flash_prefill_matches_reference(b, t, h, hkv, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, hkv, d)).astype(np.float32))
    offsets = jnp.asarray([0, 7][:b], dtype=jnp.int32)
    want = np.asarray(reference(q, k, v, offsets))
    got = np.asarray(flash_prefill_attention(q, k, v, offsets, interpret=True))
    # fully-masked query rows (i < offset) are garbage in both; compare valid
    for bi in range(b):
        o = int(offsets[bi])
        np.testing.assert_allclose(
            got[bi, o:], want[bi, o:], rtol=2e-3, atol=2e-3
        )


def test_flash_prefill_causality():
    rng = np.random.default_rng(1)
    b, t, h, hkv, d = 1, 128, 2, 1, 64
    q = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, hkv, d)).astype(np.float32))
    off = jnp.zeros((b,), jnp.int32)
    y1 = np.asarray(flash_prefill_attention(q, k, v, off, interpret=True))
    k2 = k.at[:, 100:].add(3.0)
    v2 = v.at[:, 100:].add(3.0)
    y2 = np.asarray(flash_prefill_attention(q, k2, v2, off, interpret=True))
    np.testing.assert_allclose(y1[:, :100], y2[:, :100], atol=1e-4)
