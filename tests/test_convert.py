"""Converter tests: weight-norm folding vs torch, round-trip through the
torch-layout export, and native checkpoint save/load."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fish_speech_tpu.config import dual_ar_tiny
from fish_speech_tpu.convert.dual_ar import convert_dual_ar, export_dual_ar
from fish_speech_tpu.convert.torch_state import fold_weight_norm, fuse_wqkv
from fish_speech_tpu.models.dual_ar import forward_train, init_dual_ar
from fish_speech_tpu.utils.checkpoint import (
    load_dual_ar,
    load_params,
    save_dual_ar,
    save_params,
)


def test_fold_weight_norm_matches_torch():
    conv = torch.nn.Conv1d(4, 8, 5)
    wn = torch.nn.utils.parametrizations.weight_norm(conv, dim=0)
    state = {f"conv.{k}": v.detach().numpy() for k, v in wn.state_dict().items()}
    assert "conv.parametrizations.weight.original0" in state
    folded = fold_weight_norm(state)
    np.testing.assert_allclose(
        folded["conv.weight"], wn.weight.detach().numpy(), rtol=1e-5, atol=1e-6
    )
    assert "conv.bias" in folded


def test_fold_weight_norm_old_naming():
    v = np.random.default_rng(0).normal(size=(8, 4, 5)).astype(np.float32)
    g = np.random.default_rng(1).uniform(0.5, 2, size=(8, 1, 1)).astype(np.float32)
    state = {"c.weight_g": g, "c.weight_v": v}
    folded = fold_weight_norm(state)
    norm = np.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
    np.testing.assert_allclose(folded["c.weight"], g * v / norm, rtol=1e-5)


def test_fold_weight_norm_transposed_conv_matches_torch():
    conv = torch.nn.ConvTranspose1d(6, 3, 4)
    wn = torch.nn.utils.parametrizations.weight_norm(conv, dim=0)
    state = {f"c.{k}": v.detach().numpy() for k, v in wn.state_dict().items()}
    folded = fold_weight_norm(state)
    np.testing.assert_allclose(
        folded["c.weight"], wn.weight.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_fuse_wqkv():
    wq = np.ones((8, 4), np.float32)
    wk = np.full((2, 4), 2, np.float32)
    wv = np.full((2, 4), 3, np.float32)
    state = {
        "layers.0.attention.wq.weight": wq,
        "layers.0.attention.wk.weight": wk,
        "layers.0.attention.wv.weight": wv,
        "other": np.zeros(1),
    }
    fused = fuse_wqkv(state)
    assert "layers.0.attention.wq.weight" not in fused
    assert fused["layers.0.attention.wqkv.weight"].shape == (12, 4)
    np.testing.assert_array_equal(fused["layers.0.attention.wqkv.weight"][:8], wq)


def test_dual_ar_export_import_roundtrip():
    """native -> torch layout -> native must be the identity, and the model
    must produce identical outputs."""
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3,
        attention_qk_norm=True, tie_word_embeddings=False,
    )
    params = init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    torch_state = export_dual_ar(params, cfg)
    params2 = convert_dual_ar(torch_state, cfg)

    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(jnp.asarray, params2)
    )
    assert len(flat1) == len(flat2)

    rng = np.random.default_rng(0)
    inp = np.zeros((1, cfg.num_codebooks + 1, 8), dtype=np.int32)
    inp[0, 0] = rng.integers(4, 200, size=8)
    l1, c1 = forward_train(params, cfg, jnp.asarray(inp), remat=False)
    l2, c2 = forward_train(
        params2, cfg, jnp.asarray(inp), remat=False
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


def test_native_checkpoint_roundtrip(tmp_path, tokenizer):
    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3)
    params = init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    save_dual_ar(tmp_path, params, cfg, tokenizer)
    params2, cfg2 = load_dual_ar(tmp_path, dtype=jnp.bfloat16)
    assert cfg2 == cfg
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (tmp_path / "tokenizer.json").exists()


def test_dac_native_checkpoint_roundtrip(tmp_path):
    from fish_speech_tpu.config import dac_tiny
    from fish_speech_tpu.models.dac import init_dac
    from fish_speech_tpu.utils.checkpoint import load_dac, save_dac

    cfg = dac_tiny()
    params = init_dac(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    save_dac(tmp_path, params, cfg)
    params2, cfg2 = load_dac(tmp_path)
    assert cfg2 == cfg
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
