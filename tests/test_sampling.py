import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.ops.sampling import (
    logits_to_probs,
    ras_select,
    sample,
    sample_from_probs,
)


def numpy_reference_probs(logits, temperature, top_p, top_k):
    """Independent numpy implementation of the sampling filter semantics."""
    logits = np.asarray(logits, dtype=np.float64)
    order = np.argsort(-logits)
    sorted_logits = logits[order]
    e = np.exp(sorted_logits - sorted_logits.max())
    probs_sorted = e / e.sum()
    # fp32 cumsum like the device computation: the `cum > top_p` comparison
    # is boundary-sensitive, so the oracle must use matching precision
    cum = np.cumsum(probs_sorted.astype(np.float32))
    remove_sorted = (cum > top_p) | (np.arange(len(logits)) >= top_k)
    remove_sorted[0] = False
    remove = np.empty_like(remove_sorted)
    remove[order] = remove_sorted
    filtered = np.where(remove, -np.inf, logits)
    filtered = filtered / max(temperature, 1e-5)
    e = np.exp(filtered - filtered[~remove].max())
    return e / e.sum()


def test_logits_to_probs_matches_numpy():
    rng = np.random.default_rng(0)
    for _ in range(5):
        logits = rng.normal(size=32).astype(np.float32) * 3
        # top_p=1.0 is excluded: whether the final fp32 cumsum lands at
        # 1.0+eps decides removal of the lowest-ranked element — a
        # precision coin-flip with no semantic effect.
        for temp, top_p, top_k in [(1.0, 0.9, 30), (0.7, 0.5, 5), (1.5, 0.98, 32)]:
            got = np.asarray(
                logits_to_probs(jnp.asarray(logits), temp, top_p, top_k)
            )
            want = numpy_reference_probs(logits, temp, top_p, top_k)
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)


def test_top_k_limits_support():
    logits = jnp.asarray(np.linspace(0, 5, 20, dtype=np.float32))
    probs = np.asarray(logits_to_probs(logits, 1.0, 1.0, 3))
    assert (probs > 0).sum() == 3
    # the top-3 logits are the last three
    assert probs[-3:].sum() > 0.999


def test_top_p_keeps_at_least_one():
    logits = jnp.asarray(np.zeros(10, dtype=np.float32))
    probs = np.asarray(logits_to_probs(logits, 1.0, 0.01, 10))
    assert (probs > 0).sum() == 1


def test_sampler_respects_distribution():
    # top_p semantics (reference `inference.py:60-66`): rank i is removed
    # when the INCLUSIVE cumsum exceeds top_p, so with probs
    # [0.4, 0.3, 0.2, 0.1] and top_p=0.95 the last class gets zero mass and
    # the rest renormalize to [4/9, 3/9, 2/9].
    key = jax.random.PRNGKey(0)
    logits = jnp.log(jnp.asarray([0.4, 0.3, 0.2, 0.1]))
    keys = jax.random.split(key, 2000)
    draws = jax.jit(
        jax.vmap(lambda k: sample(k, logits, 1.0, 0.95, 4))
    )(keys)
    counts = np.bincount(np.asarray(draws), minlength=4) / 2000
    np.testing.assert_allclose(counts, [4 / 9, 3 / 9, 2 / 9, 0.0], atol=0.04)


def test_greedyish_at_low_temperature():
    key = jax.random.PRNGKey(1)
    logits = jnp.asarray([0.1, 5.0, 0.2, 0.3], dtype=jnp.float32)
    for i in range(10):
        k = jax.random.fold_in(key, i)
        assert int(sample(k, logits, 0.01, 1.0, 4)) == 1


def test_batched_sampling_shapes():
    key = jax.random.PRNGKey(2)
    logits = jnp.zeros((4, 16))
    out = sample(key, logits, 1.0, 0.9, 8)
    assert out.shape == (4,)


def test_ras_select_truth_table():
    sb, se = 100, 200
    window = jnp.asarray([[150, 151, 152], [150, 151, 152]], dtype=jnp.int32)
    normal = jnp.asarray([151, 160], dtype=jnp.int32)  # first in window, 2nd not
    high = jnp.asarray([1, 2], dtype=jnp.int32)
    out = np.asarray(ras_select(normal, high, window, sb, se))
    assert out[0] == 1  # repeated semantic -> high-temp sample
    assert out[1] == 160  # not repeated -> normal

    # non-semantic token repeats are never replaced
    normal = jnp.asarray([150 + 1000, 151], dtype=jnp.int32)
    window2 = jnp.asarray([[1150, 0, 0], [0, 0, 0]], dtype=jnp.int32)
    out = np.asarray(ras_select(normal, high, window2, sb, se))
    assert out[0] == 1150  # in window but not semantic
    assert out[1] == 151  # semantic but not in window
