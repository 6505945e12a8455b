import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.config import dual_ar_tiny
from fish_speech_tpu.models import dual_ar
from fish_speech_tpu.models.lora import (
    LoraConfig,
    add_lora,
    apply_lora_config,
    extract_lora,
    lora_filter,
    merge_lora,
)


def setup(tie=True):
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3,
        tie_word_embeddings=tie,
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lcfg = LoraConfig(r=4, lora_alpha=8)
    cfg_l = apply_lora_config(cfg, lcfg)
    params_l = add_lora(params, cfg, lcfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    return cfg, cfg_l, params, params_l, lcfg


def random_inp(cfg, t=10):
    rng = np.random.default_rng(0)
    inp = np.zeros((1, cfg.num_codebooks + 1, t), dtype=np.int32)
    inp[0, 0] = rng.integers(4, 200, size=t)
    return jnp.asarray(inp)


def test_lora_zero_b_is_identity():
    """Freshly added LoRA (B = 0) must not change the forward."""
    cfg, cfg_l, params, params_l, _ = setup()
    inp = random_inp(cfg)
    l0, c0 = dual_ar.forward_train(params, cfg, inp, remat=False)
    l1, c1 = dual_ar.forward_train(params_l, cfg_l, inp, remat=False)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-6)


def test_lora_changes_output_when_b_nonzero():
    cfg, cfg_l, params, params_l, _ = setup()
    # poke a B matrix
    params_l["layers"]["lora"]["wqkv"]["b"] = (
        params_l["layers"]["lora"]["wqkv"]["b"] + 0.1
    )
    inp = random_inp(cfg)
    l0, _ = dual_ar.forward_train(params, cfg, inp, remat=False)
    l1, _ = dual_ar.forward_train(params_l, cfg_l, inp, remat=False)
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


def test_merge_lora_matches_runtime():
    """merged plain weights == runtime LoRA forward."""
    cfg, cfg_l, params, params_l, _ = setup(tie=False)
    # randomize all B matrices so the delta is nontrivial
    key = jax.random.PRNGKey(7)

    def randomize(path, leaf):
        nonlocal key
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        if "lora" in names and names.endswith("b"):
            key, sub = jax.random.split(key)
            return jax.random.normal(sub, leaf.shape, leaf.dtype) * 0.05
        return leaf

    params_l = jax.tree_util.tree_map_with_path(randomize, params_l)

    inp = random_inp(cfg)
    l_rt, c_rt = dual_ar.forward_train(params_l, cfg_l, inp, remat=False)
    merged = merge_lora(params_l, cfg_l)
    l_m, c_m = dual_ar.forward_train(merged, cfg, inp, remat=False)
    np.testing.assert_allclose(np.asarray(l_rt), np.asarray(l_m), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(c_rt), np.asarray(c_m), rtol=2e-4, atol=2e-4)

    # merged tree has no lora leaves left
    assert not any(
        "lora" in "/".join(str(getattr(p, "key", p)) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(merged)[0]
    )


def test_lora_filter_and_extract():
    cfg, cfg_l, params, params_l, _ = setup()
    filt = lora_filter(params_l)
    leaves, _ = jax.tree_util.tree_flatten(filt)
    assert any(leaves) and not all(leaves)
    only = extract_lora(params_l)
    only_leaves = jax.tree_util.tree_leaves(only)
    n_lora_flags = sum(bool(x) for x in leaves)
    assert len(only_leaves) == n_lora_flags


def test_lora_restricted_head_consistency():
    """semantic_head_logits must include the LoRA contribution (match the
    full head slice)."""
    cfg, cfg_l, params, params_l, _ = setup(tie=True)
    params_l["lora_embeddings"]["b"] = (
        jax.random.normal(jax.random.PRNGKey(3),
                          params_l["lora_embeddings"]["b"].shape) * 0.05
    )
    x = jax.random.normal(jax.random.PRNGKey(4), (2, cfg.dim), jnp.float32)
    full = dual_ar._lm_head(params_l, cfg_l, x[:, None])[:, 0]
    restricted = dual_ar.semantic_head_logits(params_l, cfg_l, x)
    sb, se = cfg.semantic_begin_id, cfg.semantic_end_id
    np.testing.assert_allclose(
        np.asarray(restricted[:, :-1]), np.asarray(full[:, sb : se + 1]), rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(restricted[:, -1]), np.asarray(full[:, cfg.im_end_id]), rtol=1e-4,
        atol=1e-5,
    )
