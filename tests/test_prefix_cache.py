"""Voice-clone prefix caching (`GenerationSession(prefix_cache_size=N)`).

Contract: a request whose prompt shares a >=64-column prefix with a
recently-served prompt restores that prefix's KV rows and prefills only
the suffix — and produces EXACTLY the tokens a cold full prefill would
(same seed), because causal attention makes k/v at position j depend
only on tokens 0..j.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import SamplingConfig, dual_ar_tiny
from fish_speech_tpu.generate import GenerationSession
from fish_speech_tpu.models import dual_ar


@pytest.fixture(scope="module")
def setup():
    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3,
                       max_seq_len=256)
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def _prompt(cfg, t, seed=0):
    rng = np.random.default_rng(seed)
    inp = np.zeros((cfg.num_codebooks + 1, t), dtype=np.int32)
    inp[0] = rng.integers(4, 200, size=t)
    return inp


def _mk(params, cfg, prefix_cache_size, **kw):
    return GenerationSession(params, cfg, SamplingConfig(), max_batch=1,
                             dtype=jnp.float32, decode_chunk_size=4,
                             prefix_cache_size=prefix_cache_size, **kw)


@pytest.mark.slow
def test_bf16_hit_vs_cold_logit_bound():
    """Measured numerics envelope for the prefix-cache hit path at bf16
    across the flash/XLA attention boundary.

    On TPU a >=512-token cold prefill runs the Pallas flash kernel while
    the hit path's short suffix pass runs XLA attention — two reduction
    orders over the same keys (README discusses this; SGLang's radix cache
    shares the property). This test reproduces that exact boundary on CPU
    (flash kernel in interpret mode vs `prefill_suffix`'s XLA attention)
    with bf16 weights and KV, and pins max |Δlogit| between a cold full
    prefill and a prefix-restore + suffix prefill. Typical measured delta
    is ~0.004 on |logit| ~ O(10); the bound asserts an order of magnitude
    of headroom so it fails on real divergence (wrong positions, unmasked
    pad, mis-restored rows), not on fp noise."""
    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3,
                       max_seq_len=1024)
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    t_pre, t_suf = 512, 32
    inp = _prompt(cfg, t_pre + t_suf, seed=3)[None]  # (1, C+1, T)
    zero_off = jnp.zeros((1,), jnp.int32)

    old = dual_ar.FLASH_PREFILL
    dual_ar.FLASH_PREFILL = "interpret"  # the TPU >=512-prompt kernel path
    try:
        # cold: one full flash prefill over all 544 columns
        cache = dual_ar.init_kv_cache(cfg, 1, t_pre + t_suf, dtype=jnp.bfloat16)
        logits_cold, _, _ = dual_ar.prefill(
            params, cfg, jnp.asarray(inp), cache, zero_off,
            jnp.int32(t_pre + t_suf),
        )
        # hit: flash-prefill the shared 512-column prefix (what populated
        # the store), then XLA-attention suffix prefill over the cached rows
        cache = dual_ar.init_kv_cache(cfg, 1, t_pre + t_suf, dtype=jnp.bfloat16)
        _, _, cache = dual_ar.prefill(
            params, cfg, jnp.asarray(inp[:, :, :t_pre]), cache, zero_off,
            jnp.int32(t_pre),
        )
    finally:
        dual_ar.FLASH_PREFILL = old
    logits_hit, _, _ = dual_ar.prefill_suffix(
        params, cfg, jnp.asarray(inp[:, :, t_pre:]), cache,
        jnp.int32(t_pre), jnp.int32(t_suf), kv_len=t_pre + t_suf,
    )

    delta = float(jnp.max(jnp.abs(logits_cold - logits_hit)))
    scale = float(jnp.max(jnp.abs(logits_cold)))
    assert np.isfinite(delta)
    assert delta <= 0.05 * max(scale, 1.0), (
        f"hit-vs-cold bf16 logit delta {delta:.4f} exceeds envelope "
        f"(logit scale {scale:.2f})"
    )
    # and the argmax decision itself should agree on this random model
    assert int(jnp.argmax(logits_cold)) == int(jnp.argmax(logits_hit))


def test_hit_path_tokens_identical_to_cold(setup):
    cfg, params = setup
    shared = _prompt(cfg, 140, seed=1)
    tail_a = _prompt(cfg, 12, seed=2)
    tail_b = _prompt(cfg, 20, seed=3)
    prompt_a = np.concatenate([shared, tail_a], axis=1)
    prompt_b = np.concatenate([shared, tail_b], axis=1)

    warm = _mk(params, cfg, prefix_cache_size=2)
    out_a = warm.generate(prompt_a, jax.random.PRNGKey(5), max_new_tokens=8)
    assert warm.prefix_misses == 1 and warm.prefix_hits == 0
    out_b = warm.generate(prompt_b, jax.random.PRNGKey(6), max_new_tokens=8)
    assert warm.prefix_hits == 1, "second request must reuse the prefix"

    cold = _mk(params, cfg, prefix_cache_size=0)
    ref_a = cold.generate(prompt_a, jax.random.PRNGKey(5), max_new_tokens=8)
    ref_b = cold.generate(prompt_b, jax.random.PRNGKey(6), max_new_tokens=8)
    np.testing.assert_array_equal(out_a, ref_a)
    np.testing.assert_array_equal(out_b, ref_b)


def test_repeat_same_prompt_hits(setup):
    cfg, params = setup
    prompt = _prompt(cfg, 150, seed=9)
    warm = _mk(params, cfg, prefix_cache_size=2)
    a = warm.generate(prompt, jax.random.PRNGKey(1), max_new_tokens=6)
    b = warm.generate(prompt, jax.random.PRNGKey(1), max_new_tokens=6)
    assert warm.prefix_hits == 1
    np.testing.assert_array_equal(a, b)  # deterministic across hit/miss


def test_short_prompts_not_cached(setup):
    cfg, params = setup
    warm = _mk(params, cfg, prefix_cache_size=2)
    p = _prompt(cfg, 40, seed=4)
    warm.generate(p, jax.random.PRNGKey(0), max_new_tokens=4)
    warm.generate(p, jax.random.PRNGKey(0), max_new_tokens=4)
    assert warm.prefix_hits == 0 and len(warm.prefix) == 0


def test_lru_eviction(setup):
    cfg, params = setup
    warm = _mk(params, cfg, prefix_cache_size=2)
    for s in range(3):
        warm.generate(_prompt(cfg, 130, seed=20 + s), jax.random.PRNGKey(s),
                      max_new_tokens=4)
    assert len(warm.prefix) == 2


def test_unrelated_prompt_misses(setup):
    cfg, params = setup
    warm = _mk(params, cfg, prefix_cache_size=2)
    warm.generate(_prompt(cfg, 140, seed=30), jax.random.PRNGKey(0),
                  max_new_tokens=4)
    warm.generate(_prompt(cfg, 140, seed=31), jax.random.PRNGKey(0),
                  max_new_tokens=4)
    assert warm.prefix_hits == 0 and warm.prefix_misses == 2


def test_prefix_cache_with_kv_quant(setup):
    """Prefix rows restore scales too; tokens stay valid (approx path)."""
    cfg, params = setup
    warm = _mk(params, cfg, prefix_cache_size=2, kv_quant=True)
    shared = _prompt(cfg, 140, seed=40)
    for tail_seed in (41, 42):
        prompt = np.concatenate(
            [shared, _prompt(cfg, 10, seed=tail_seed)], axis=1
        )
        out = warm.generate(prompt, jax.random.PRNGKey(2), max_new_tokens=6)
        main = out[0]
        ok = ((main >= cfg.semantic_begin_id) &
              (main <= cfg.semantic_end_id)) | (main == cfg.im_end_id)
        assert ok.all()
    assert warm.prefix_hits == 1
