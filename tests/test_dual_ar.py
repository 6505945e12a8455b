import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import dual_ar_tiny
from fish_speech_tpu.models import dual_ar


@pytest.fixture(scope="module")
def setup():
    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3)
    key = jax.random.PRNGKey(0)
    params = dual_ar.init_dual_ar(key, cfg, dtype=jnp.float32)
    return cfg, params


def random_prompt(cfg, t, rng=None, semantic_from=5):
    """Prompt mixing text tokens and semantic frames."""
    rng = rng or np.random.default_rng(42)
    inp = np.zeros((cfg.num_codebooks + 1, t), dtype=np.int32)
    inp[0] = rng.integers(4, 200, size=t)
    # make positions semantic_from.. semantic frames
    codes = rng.integers(0, cfg.codebook_size, size=(cfg.num_codebooks, t))
    sem = np.zeros(t, dtype=bool)
    sem[semantic_from:] = True
    inp[0, sem] = cfg.semantic_begin_id + codes[0, sem] % (
        cfg.semantic_end_id - cfg.semantic_begin_id + 1
    )
    inp[1:, sem] = codes[:, sem]
    return inp


def test_forward_train_shapes(setup):
    cfg, params = setup
    inp = jnp.asarray(random_prompt(cfg, 16)[None])
    tok_logits, cb_logits = dual_ar.forward_train(params, cfg, inp, remat=False)
    assert tok_logits.shape == (1, 16, cfg.vocab_size)
    assert cb_logits.shape == (1, 16, cfg.num_codebooks, cfg.codebook_size)
    assert np.isfinite(np.asarray(tok_logits)).all()


def test_embed_gating(setup):
    """Codebook embeddings must be zeroed at non-semantic positions."""
    cfg, params = setup
    inp = np.zeros((1, cfg.num_codebooks + 1, 4), dtype=np.int32)
    inp[0, 0] = [10, 11, 12, 13]  # all non-semantic
    inp[0, 1:] = 7  # garbage codebook values
    x1 = dual_ar.embed_tokens(params, cfg, jnp.asarray(inp))
    inp2 = inp.copy()
    inp2[0, 1:] = 3  # different garbage
    x2 = dual_ar.embed_tokens(params, cfg, jnp.asarray(inp2))
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2))


def test_prefill_matches_forward_train(setup):
    """Prefill's last-position logits == teacher-forced forward logits."""
    cfg, params = setup
    t = 12
    inp = random_prompt(cfg, t)
    tok_logits, _ = dual_ar.forward_train(
        params, cfg, jnp.asarray(inp[None]), remat=False
    )
    cache = dual_ar.init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    logits, hidden, cache = dual_ar.prefill(
        params, cfg, jnp.asarray(inp[None]), cache,
        jnp.zeros((1,), jnp.int32), jnp.int32(t),
    )
    np.testing.assert_allclose(
        np.asarray(logits[0]), np.asarray(tok_logits[0, t - 1]), rtol=2e-4, atol=2e-4
    )


def test_prefill_padding_invariance(setup):
    """Right-padding the prompt must not change the last-position output."""
    cfg, params = setup
    t = 10
    inp = random_prompt(cfg, t)
    cache = dual_ar.init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    logits_exact, _, _ = dual_ar.prefill(
        params, cfg, jnp.asarray(inp[None]), cache,
        jnp.zeros((1,), jnp.int32), jnp.int32(t),
    )
    padded = np.zeros((cfg.num_codebooks + 1, 24), dtype=np.int32)
    padded[:, :t] = inp
    padded[0, t:] = 17  # garbage in the pad region
    logits_pad, _, _ = dual_ar.prefill(
        params, cfg, jnp.asarray(padded[None]), cache,
        jnp.zeros((1,), jnp.int32), jnp.int32(t),
    )
    np.testing.assert_allclose(
        np.asarray(logits_exact), np.asarray(logits_pad), rtol=1e-5, atol=1e-5
    )


def test_decode_matches_forward_train(setup):
    """Stepwise decode through the KV cache reproduces teacher-forced logits
    at every position — the key correctness property of the cache."""
    cfg, params = setup
    t = 9
    inp = random_prompt(cfg, t)
    tok_logits, _ = dual_ar.forward_train(
        params, cfg, jnp.asarray(inp[None]), remat=False
    )

    # prefill with the first token only, then decode the rest step by step
    cache = dual_ar.init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    _, _, cache = dual_ar.prefill(
        params, cfg, jnp.asarray(inp[None, :, :1]), cache,
        jnp.zeros((1,), jnp.int32), jnp.int32(1),
    )
    for pos in range(1, t):
        token = jnp.asarray(inp[None, :, pos])
        hidden, slow_out, cache = dual_ar.decode_slow_step(
            params, cfg, token, cache, jnp.int32(pos)
        )
        step_logits = dual_ar._lm_head(params, cfg, slow_out[:, None])[:, 0]
        np.testing.assert_allclose(
            np.asarray(step_logits[0]),
            np.asarray(tok_logits[0, pos]),
            rtol=2e-4,
            atol=2e-4,
            err_msg=f"mismatch at position {pos}",
        )


def test_semantic_head_matches_full_head(setup):
    """Restricted head == slice of the full-vocab head."""
    cfg, params = setup
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.dim), jnp.float32)
    full = dual_ar._lm_head(params, cfg, x[:, None])[:, 0]
    restricted = dual_ar.semantic_head_logits(params, cfg, x)
    sb, se = cfg.semantic_begin_id, cfg.semantic_end_id
    np.testing.assert_allclose(
        np.asarray(restricted[:, :-1]), np.asarray(full[:, sb : se + 1]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(restricted[:, -1]), np.asarray(full[:, cfg.im_end_id]), rtol=1e-5
    )
    # index mapping
    idx = jnp.asarray([0, se - sb, se - sb + 1])
    toks = dual_ar.semantic_index_to_token(cfg, idx)
    assert toks.tolist() == [sb, se, cfg.im_end_id]


def test_fast_decode_matches_fast_train(setup):
    """Fast-AR stepwise decode == teacher-forced fast forward."""
    cfg, params = setup
    rng = np.random.default_rng(7)
    n = 3
    hidden = jnp.asarray(rng.normal(size=(n, cfg.dim)).astype(np.float32))
    codebooks = jnp.asarray(
        rng.integers(0, cfg.codebook_size, size=(n, cfg.num_codebooks - 1)).astype(
            np.int32
        )
    )
    train_logits = dual_ar.fast_forward_train(params, cfg, hidden, codebooks)

    fast_cache = dual_ar.init_fast_kv_cache(cfg, n, dtype=jnp.float32)
    x0 = dual_ar.fast_project_in(params, cfg, hidden)
    logits0, fast_cache = dual_ar.fast_decode_step(
        params, cfg, x0, fast_cache, jnp.int32(0)
    )
    np.testing.assert_allclose(
        np.asarray(logits0), np.asarray(train_logits[:, 0]), rtol=2e-4, atol=2e-4
    )
    for i in range(1, cfg.num_codebooks):
        x = jnp.take(params["fast"]["embeddings"], codebooks[:, i - 1], axis=0)
        logits_i, fast_cache = dual_ar.fast_decode_step(
            params, cfg, x, fast_cache, jnp.int32(i)
        )
        np.testing.assert_allclose(
            np.asarray(logits_i),
            np.asarray(train_logits[:, i]),
            rtol=2e-4,
            atol=2e-4,
            err_msg=f"fast mismatch at codebook {i}",
        )


def test_causality(setup):
    """Changing a future token must not affect past logits."""
    cfg, params = setup
    t = 8
    inp = random_prompt(cfg, t)
    logits1, _ = dual_ar.forward_train(params, cfg, jnp.asarray(inp[None]), remat=False)
    inp2 = inp.copy()
    inp2[0, -1] = 99
    logits2, _ = dual_ar.forward_train(params, cfg, jnp.asarray(inp2[None]), remat=False)
    np.testing.assert_allclose(
        np.asarray(logits1[0, : t - 1]), np.asarray(logits2[0, : t - 1]), atol=1e-5
    )
    assert not np.allclose(np.asarray(logits1[0, -1]), np.asarray(logits2[0, -1]))


def test_param_count_tiny(setup):
    cfg, params = setup
    n = dual_ar.param_count(params)
    assert n > 0
    # embeddings alone
    assert n > cfg.vocab_size * cfg.dim


def test_prefill_per_row_t_end_matches_single(setup):
    """Grouped right-aligned prefill (per-row t_end, zero offsets) must give
    each row exactly what a solo prefill of that prompt gives: same last
    logits/hidden and the same cache prefix [0, t_i)."""
    cfg, params = setup
    rng = np.random.default_rng(7)
    lens = [6, 12, 9]
    bucket = 16
    b = len(lens)
    inp = np.zeros((b, cfg.num_codebooks + 1, bucket), dtype=np.int32)
    prompts = []
    for i, t in enumerate(lens):
        p = random_prompt(cfg, t, rng=rng)
        prompts.append(p)
        inp[i, :, :t] = p

    cache = dual_ar.init_kv_cache(cfg, b, 32, dtype=jnp.float32)
    logits, hidden, cache = dual_ar.prefill(
        params, cfg, jnp.asarray(inp), cache, jnp.zeros((b,), jnp.int32),
        jnp.asarray(lens, jnp.int32),
    )

    for i, (t, p) in enumerate(zip(lens, prompts)):
        sin = np.zeros((1, cfg.num_codebooks + 1, bucket), dtype=np.int32)
        sin[0, :, :t] = p
        c1 = dual_ar.init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
        l1, h1, c1 = dual_ar.prefill(
            params, cfg, jnp.asarray(sin), c1, jnp.zeros((1,), jnp.int32),
            jnp.int32(t),
        )
        np.testing.assert_allclose(
            np.asarray(logits[i]), np.asarray(l1[0]), rtol=2e-5, atol=2e-5,
            err_msg=f"row {i} logits",
        )
        np.testing.assert_allclose(
            np.asarray(hidden[i]), np.asarray(h1[0]), rtol=2e-5, atol=2e-5,
            err_msg=f"row {i} hidden",
        )
        np.testing.assert_allclose(
            np.asarray(cache["k"][:, i, :t]), np.asarray(c1["k"][:, 0, :t]),
            rtol=2e-5, atol=2e-5, err_msg=f"row {i} cache",
        )


class TestFFNFusion:
    """`fuse_ffn_weights` (w1|w3 -> w13) must be numerically identical to
    the split form on every weight format the runtime supports."""

    def test_plain_weights_exact(self, setup):
        cfg, params = setup
        fused = dual_ar.fuse_ffn_weights(params)
        assert "w13" in fused["layers"] and "w1" not in fused["layers"]
        assert "w13" in fused["fast"]["layers"]
        inp = jnp.asarray(random_prompt(cfg, 12)[None])
        ref_tok, ref_cb = dual_ar.forward_train(params, cfg, inp, remat=False)
        got_tok, got_cb = dual_ar.forward_train(fused, cfg, inp, remat=False)
        # per-output-column math is unchanged -> bitwise equal
        np.testing.assert_array_equal(np.asarray(ref_tok), np.asarray(got_tok))
        np.testing.assert_array_equal(np.asarray(ref_cb), np.asarray(got_cb))

    @pytest.mark.parametrize("mode", ["int8", "int4"])
    def test_quantized_weights_exact(self, setup, mode):
        from fish_speech_tpu.ops.quant import quantize_layer_stack

        cfg, params = setup
        q = dict(params)
        q["layers"] = quantize_layer_stack(params["layers"], mode=mode,
                                           group_size=16)
        fused = dual_ar.fuse_ffn_weights(q)
        key = "q" if mode == "int8" else "p"
        assert key in fused["layers"]["w13"]
        inp = jnp.asarray(random_prompt(cfg, 8)[None])
        ref_tok, _ = dual_ar.forward_train(q, cfg, inp, remat=False)
        got_tok, _ = dual_ar.forward_train(fused, cfg, inp, remat=False)
        np.testing.assert_array_equal(np.asarray(ref_tok), np.asarray(got_tok))

    def test_generate_tokens_identical(self, setup):
        from fish_speech_tpu.config import SamplingConfig
        from fish_speech_tpu.generate import GenerationSession

        cfg, params = setup
        prompt = random_prompt(cfg, 10)
        kw = dict(max_batch=1, dtype=jnp.float32, decode_chunk_size=4)
        s_ref = GenerationSession(params, cfg, SamplingConfig(),
                                  fuse_ffn=False, **kw)
        s_fused = GenerationSession(params, cfg, SamplingConfig(),
                                    fuse_ffn=True, **kw)
        assert "w13" in s_fused.params["layers"]
        a = s_ref.generate(prompt, jax.random.PRNGKey(5), max_new_tokens=10)
        b = s_fused.generate(prompt, jax.random.PRNGKey(5), max_new_tokens=10)
        np.testing.assert_array_equal(a, b)

    def test_lora_deltas_still_apply(self, setup):
        from fish_speech_tpu.models.lora import (
            LoraConfig, add_lora, apply_lora_config,
        )

        cfg, params = setup
        lcfg = LoraConfig(r=2, lora_alpha=4)
        cfg_l = apply_lora_config(cfg, lcfg)
        params_l = add_lora(params, cfg, lcfg, jax.random.PRNGKey(1),
                            dtype=jnp.float32)
        # make the mlp deltas nonzero so the fused path must still add them
        for stack in (params_l["layers"], params_l["fast"]["layers"]):
            for name in ("w1", "w3"):
                if name in stack.get("lora", {}):
                    stack["lora"][name]["b"] = (
                        stack["lora"][name]["b"] + 0.05
                    )
        fused = dual_ar.fuse_ffn_weights(params_l)
        assert "w1" in fused["layers"]["lora"]
        inp = jnp.asarray(random_prompt(cfg, 8)[None])
        ref_tok, _ = dual_ar.forward_train(params_l, cfg_l, inp, remat=False)
        got_tok, _ = dual_ar.forward_train(fused, cfg_l, inp, remat=False)
        np.testing.assert_array_equal(np.asarray(ref_tok), np.asarray(got_tok))
