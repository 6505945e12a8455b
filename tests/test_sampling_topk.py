"""The fast top-k sampler must be distribution-identical to the exact
full-sort sampler whenever runtime top_k <= TOP_K_CAP."""

import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.ops.sampling import (
    logits_to_probs,
    sample_topk,
    topk_state,
)


def filtered_probs_via_topk(logits, temperature, top_p, top_k, k_cap=64):
    """Recover the full-vocab filtered distribution implied by the top-k
    sampler (probability mass on idx[j] is p[j])."""
    state = topk_state(logits, k_cap)
    vals, idx, lse = state
    top_k = min(top_k, k_cap)
    probs = np.exp(np.asarray(vals) - np.asarray(lse))
    cum = np.cumsum(probs)
    remove = (cum > top_p) | (np.arange(k_cap) >= top_k)
    remove[0] = False
    filtered = np.where(remove, -np.inf, np.asarray(vals)) / max(temperature, 1e-5)
    e = np.exp(filtered - filtered[~remove].max())
    p = e / e.sum()
    full = np.zeros(logits.shape[-1])
    full[np.asarray(idx)] = p
    return full


def test_topk_sampler_matches_exact_distribution():
    rng = np.random.default_rng(0)
    for trial in range(4):
        logits = jnp.asarray(rng.normal(size=512).astype(np.float32) * 2)
        for temp, top_p, top_k in [(1.0, 0.9, 30), (0.7, 0.5, 5), (1.2, 0.8, 64)]:
            exact = np.asarray(logits_to_probs(logits, temp, top_p, top_k))
            fast = filtered_probs_via_topk(np.asarray(logits), temp, top_p, top_k)
            np.testing.assert_allclose(exact, fast, rtol=1e-3, atol=1e-6)


def test_sample_topk_returns_valid_indices():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.random.default_rng(1).normal(size=(3, 256)))
    state = topk_state(logits)
    out = sample_topk(key, state, 1.0, 0.9, 30)
    assert out.shape == (3,)
    assert ((out >= 0) & (out < 256)).all()


def test_sample_topk_greedy_at_low_temp():
    logits = np.zeros(100, dtype=np.float32)
    logits[42] = 8.0  # decisive gap: 8/0.01 = 800 nats at temperature 0.01
    state = topk_state(jnp.asarray(logits))
    for i in range(5):
        k = jax.random.PRNGKey(i)
        assert int(sample_topk(k, state, 0.01, 1.0, 10)) == 42


def test_top_k_above_cap_rejected():
    """Runtime top_k > TOP_K_CAP must fail loudly at the entry points, not
    silently truncate the nucleus to the top-64 logits."""
    import pytest

    from fish_speech_tpu.ops.sampling import TOP_K_CAP, check_top_k

    check_top_k(TOP_K_CAP)  # at the cap: fine
    with pytest.raises(ValueError, match="top_k"):
        check_top_k(TOP_K_CAP + 1)
