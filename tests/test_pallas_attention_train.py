"""Flash-TRAIN kernels (fwd + custom-VJP bwd) vs the einsum reference.

The training kernel replaces `gqa_attention` with the causal & key-valid
mask inside `_block_train` (ops/pallas_attention_train.py); these tests pin
forward and GRADIENT parity in interpret mode, at the kernel boundary and
end-to-end through `dual_ar_loss` with remat on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import dual_ar_tiny
from fish_speech_tpu.models import dual_ar
from fish_speech_tpu.ops.attention import gqa_attention
from fish_speech_tpu.ops.pallas_attention_train import flash_train_attention
from fish_speech_tpu.train.loss import dual_ar_loss


def _mask(kvalid):
    t = kvalid.shape[1]
    i = jnp.arange(t)
    return (i[None, :] <= i[:, None])[None] & kvalid[:, None, :]


@pytest.mark.parametrize(
    "b,t,h,hkv,d", [(1, 128, 4, 2, 64), (2, 256, 8, 2, 64), (2, 128, 4, 4, 32)]
)
def test_flash_train_grads_match_reference(b, t, h, hkv, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.float32)
    pad = np.zeros((b, t), bool)
    pad[0, -17:] = True
    if b > 1:
        pad[1, -3:] = True
    kvalid = jnp.asarray(~pad)
    ct = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    # padded QUERY rows get zero cotangent, exactly as the masked loss
    # delivers — the equivalence contract documented on the kernel
    ct = ct * kvalid[:, :, None, None]

    mask = _mask(kvalid)
    want_o = gqa_attention(q, k, v, mask)
    got_o = flash_train_attention(q, k, v, kvalid, True)
    np.testing.assert_allclose(
        np.asarray(got_o) * np.asarray(kvalid)[:, :, None, None],
        np.asarray(want_o) * np.asarray(kvalid)[:, :, None, None],
        rtol=1e-5, atol=1e-5,
    )

    want_g = jax.grad(
        lambda *a: jnp.vdot(gqa_attention(*a, mask), ct), argnums=(0, 1, 2)
    )(q, k, v)
    got_g = jax.grad(
        lambda *a: jnp.vdot(flash_train_attention(*a, kvalid, True), ct),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a_, b_ in zip("qkv", want_g, got_g):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a_), rtol=1e-4, atol=1e-5,
            err_msg=f"d{name} diverged",
        )


def test_flash_train_padded_keys_blocked():
    """Perturbing k/v at padded positions must not change outputs or grads
    at valid positions (the key mask blocks both directions)."""
    rng = np.random.default_rng(1)
    b, t, h, hkv, d = 1, 128, 2, 1, 32
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.float32)
    pad = np.zeros((b, t), bool)
    pad[:, -9:] = True
    kvalid = jnp.asarray(~pad)
    ct = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    ct = ct * kvalid[:, :, None, None]

    def loss(q, k, v):
        return jnp.vdot(flash_train_attention(q, k, v, kvalid, True), ct)

    g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss, argnums=(0, 1, 2))(
        q, k.at[:, -9:].add(5.0), v.at[:, -9:].add(5.0)
    )
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g1[1][:, :-9]), np.asarray(g2[1][:, :-9]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g1[2][:, :-9]), np.asarray(g2[2][:, :-9]), atol=1e-5
    )


def test_forward_train_flash_path_matches_xla(tokenizer):
    """End-to-end: dual_ar_loss value + param grads with FLASH_TRAIN
    interpret vs off, remat ON (the kernel runs inside jax.checkpoint —
    fwd, recompute, and custom-VJP bwd all exercised)."""
    cfg = dual_ar_tiny(
        vocab_size=tokenizer.vocab_size,
        semantic_begin_id=tokenizer.semantic_begin_id,
        semantic_end_id=tokenizer.semantic_end_id,
        im_end_id=tokenizer.im_end_id,
        max_seq_len=64,
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b, t = 2, 32
    inputs = np.zeros((b, cfg.num_codebooks + 1, t), dtype=np.int32)
    inputs[:, 0] = rng.integers(4, 200, size=(b, t))
    sem = rng.random((b, t)) < 0.6
    span = cfg.semantic_end_id - cfg.semantic_begin_id + 1
    for i in range(b):
        codes = rng.integers(0, cfg.codebook_size,
                             size=(cfg.num_codebooks, t))
        inputs[i, 0, sem[i]] = cfg.semantic_begin_id + codes[0, sem[i]] % span
        inputs[i, 1:, sem[i]] = codes[:, sem[i]].T
    labels = inputs.copy()
    pad = np.zeros((b, t), bool)
    pad[:, -5:] = True
    labels[:, :, -5:] = -100
    batch = {"inputs": jnp.asarray(inputs), "labels": jnp.asarray(labels),
             "pad_mask": jnp.asarray(pad)}

    def run():
        return jax.value_and_grad(
            lambda p: dual_ar_loss(p, cfg, batch, remat=True)[0]
        )(params)

    old = dual_ar.FLASH_TRAIN
    try:
        dual_ar.FLASH_TRAIN = "off"
        l_ref, g_ref = run()
        dual_ar.FLASH_TRAIN = "interpret"
        l_got, g_got = run()
    finally:
        dual_ar.FLASH_TRAIN = old

    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-6)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_got = jax.tree_util.tree_leaves(g_got)
    for (path, a), b_ in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )
