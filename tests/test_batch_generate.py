"""Lockstep batched generation: left-aligned mixed-length prompts must
reproduce single-stream numerics exactly (prefill logits and stepwise
decode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import SamplingConfig, dual_ar_tiny
from fish_speech_tpu.generate import GenerationSession
from fish_speech_tpu.models import dual_ar

from tests.test_dual_ar import random_prompt


@pytest.fixture(scope="module")
def setup():
    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3)
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def test_batched_prefill_matches_single(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    p1 = random_prompt(cfg, 12, rng)
    p2 = random_prompt(cfg, 7, rng)
    t_max = 12

    # singles
    singles = []
    for p in (p1, p2):
        cache = dual_ar.init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
        logits, hidden, _ = dual_ar.prefill(
            params, cfg, jnp.asarray(p[None]), cache,
            jnp.zeros((1,), jnp.int32), jnp.int32(p.shape[1]),
        )
        singles.append((np.asarray(logits[0]), np.asarray(hidden[0])))

    # batched left-aligned
    inp = np.zeros((2, cfg.num_codebooks + 1, 16), dtype=np.int32)
    inp[0, :, :12] = p1
    inp[1, :, 5:12] = p2
    offsets = jnp.asarray([0, 5], dtype=jnp.int32)
    cache = dual_ar.init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    logits_b, hidden_b, cache = dual_ar.prefill(
        params, cfg, jnp.asarray(inp), cache, offsets, jnp.int32(t_max)
    )
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(logits_b[i]), singles[i][0], rtol=3e-4, atol=3e-4,
            err_msg=f"row {i} prefill logits mismatch",
        )


def test_batched_decode_matches_single(setup):
    """Row 1 (shorter, offset 5) decoded in lockstep must match its own
    single-stream decode at each step (same forced tokens)."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    p1 = random_prompt(cfg, 10, rng)
    p2 = random_prompt(cfg, 6, rng)
    t_max = 10
    forced = random_prompt(cfg, 4, rng)  # columns to force-feed

    # single-stream for p2
    cache = dual_ar.init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    _, _, cache = dual_ar.prefill(
        params, cfg, jnp.asarray(p2[None]), cache,
        jnp.zeros((1,), jnp.int32), jnp.int32(6),
    )
    single_logits = []
    for s in range(forced.shape[1]):
        token = jnp.asarray(forced[None, :, s])
        _, slow_out, cache = dual_ar.decode_slow_step(
            params, cfg, token, cache, jnp.int32(6 + s)
        )
        single_logits.append(np.asarray(
            dual_ar.semantic_head_logits(params, cfg, slow_out)[0]
        ))

    # batched: p1 at offset 0, p2 at offset 4 (ends aligned at 10)
    inp = np.zeros((2, cfg.num_codebooks + 1, 16), dtype=np.int32)
    inp[0, :, :10] = p1
    inp[1, :, 4:10] = p2
    offsets = jnp.asarray([0, 4], dtype=jnp.int32)
    bcache = dual_ar.init_kv_cache(cfg, 2, 32, dtype=jnp.float32)
    _, _, bcache = dual_ar.prefill(
        params, cfg, jnp.asarray(inp), bcache, offsets, jnp.int32(t_max)
    )
    for s in range(forced.shape[1]):
        token = jnp.asarray(np.stack([forced[:, s], forced[:, s]]))
        _, slow_out, bcache = dual_ar.decode_slow_step(
            params, cfg, token, bcache, jnp.int32(t_max + s), kv_valid=offsets
        )
        logits_b = dual_ar.semantic_head_logits(params, cfg, slow_out)
        np.testing.assert_allclose(
            np.asarray(logits_b[1]), single_logits[s], rtol=3e-4, atol=3e-4,
            err_msg=f"step {s} row-1 decode mismatch",
        )


def test_generate_batch_end_to_end(setup, tokenizer):
    cfg, params = setup
    session = GenerationSession(
        params, cfg, SamplingConfig(), max_batch=3, dtype=jnp.float32,
        decode_chunk_size=8,
    )
    rng = np.random.default_rng(2)
    prompts = [random_prompt(cfg, t, rng) for t in (10, 6, 8)]
    outs = session.generate_batch(
        prompts, jax.random.PRNGKey(0), max_new_tokens=12
    )
    assert len(outs) == 3
    for out in outs:
        assert out.shape[0] == cfg.num_codebooks + 1
        assert 1 <= out.shape[1] <= 12
        sb, se = cfg.semantic_begin_id, cfg.semantic_end_id
        main = out[0]
        ok = ((main >= sb) & (main <= se)) | (main == cfg.im_end_id)
        assert ok.all()
