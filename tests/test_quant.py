import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.config import dual_ar_tiny
from fish_speech_tpu.models import dual_ar
from fish_speech_tpu.ops.quant import (
    dequantize_int8,
    mm,
    quantize_dual_ar,
    quantize_int8,
)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32) * 0.1)
    qw = quantize_int8(w)
    assert qw["q"].dtype == jnp.int8
    assert qw["s"].shape == (128,)
    deq = dequantize_int8(qw, dtype=jnp.float32)
    err = np.abs(np.asarray(deq) - np.asarray(w)).max()
    # per-channel int8: error bounded by scale/2 per channel
    scale = np.asarray(qw["s"], np.float32)
    assert (np.abs(np.asarray(deq) - np.asarray(w)) <= scale[None, :] * 0.51).all()
    assert err < 0.01


def test_mm_quantized_close_to_dense():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32) * 0.05)
    dense = np.asarray(mm(x, w))
    quant = np.asarray(mm(x, quantize_int8(w)))
    rel = np.abs(dense - quant).max() / (np.abs(dense).max() + 1e-9)
    assert rel < 0.02


def test_stacked_quantized_mm():
    """Quantized weights work through the stacked-layer scan shape."""
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(3, 16, 24)).astype(np.float32) * 0.1)
    qw = quantize_int8(w)
    assert qw["q"].shape == (3, 16, 24) and qw["s"].shape == (3, 24)
    x = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    for i in range(3):
        got = np.asarray(mm(x, {"q": qw["q"][i], "s": qw["s"][i]}))
        want = np.asarray(x @ w[i])
        assert np.abs(got - want).max() / np.abs(want).max() < 0.02


def test_quantized_model_generates_close_logits():
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3,
        tie_word_embeddings=False,
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_dual_ar(params)

    rng = np.random.default_rng(0)
    inp = np.zeros((1, cfg.num_codebooks + 1, 8), dtype=np.int32)
    inp[0, 0] = rng.integers(4, 200, size=8)
    l_f, c_f = dual_ar.forward_train(params, cfg, jnp.asarray(inp), remat=False)
    l_q, c_q = dual_ar.forward_train(qparams, cfg, jnp.asarray(inp), remat=False)
    # int8 logits track fp32 logits closely in relative terms
    denom = np.abs(np.asarray(l_f)).max()
    assert np.abs(np.asarray(l_f) - np.asarray(l_q)).max() / denom < 0.06

    # decode path with quantized weights runs and matches the restricted head
    cache = dual_ar.init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    _, slow_out, cache = dual_ar.decode_slow_step(
        qparams, cfg, jnp.asarray(inp[:, :, 0]), cache, jnp.int32(0)
    )
    restricted = dual_ar.semantic_head_logits(qparams, cfg, slow_out)
    full = dual_ar._lm_head(qparams, cfg, slow_out[:, None])[:, 0]
    sb, se = cfg.semantic_begin_id, cfg.semantic_end_id
    np.testing.assert_allclose(
        np.asarray(restricted[:, :-1]), np.asarray(full[:, sb : se + 1]),
        rtol=1e-4, atol=1e-5,
    )


def test_quantized_param_bytes_halved():
    cfg = dual_ar_tiny()
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    def nbytes(tree):
        return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))

    dense_bytes = nbytes(params["layers"])
    q_bytes = nbytes(quantize_dual_ar(params)["layers"])
    assert q_bytes < dense_bytes * 0.6
