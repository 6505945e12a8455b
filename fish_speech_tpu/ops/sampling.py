"""Token sampling: temperature + nucleus (top-p) + top-k, and
Repetition-Aware Sampling (RAS) selection.

Semantics match the reference sampler (`inference.py:43-93`): top-p/top-k
filtering is computed on the *untempered* softmax, index 0 of the descending
sort is always kept, then temperature is applied and a Gumbel-trick
multinomial draws the sample. Everything is branch-free jnp (the reference
already wrote RAS branch-free for torch.compile; it maps 1:1 onto jnp.where).
"""

import jax
import jax.numpy as jnp


def logits_to_probs(logits, temperature, top_p, top_k):
    """Filtered, tempered probabilities.

    Args:
      logits: (..., V) float logits.
      temperature, top_p: scalars (python or traced).
      top_k: scalar int (python or traced); ranks >= top_k are removed.

    Returns (..., V) probabilities.
    """
    v = logits.shape[-1]
    lf = logits.astype(jnp.float32)
    order = jnp.argsort(-lf, axis=-1)  # descending
    sorted_logits = jnp.take_along_axis(lf, order, axis=-1)
    cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    ranks = jnp.arange(v)
    remove_sorted = (cum_probs > top_p) | (ranks >= top_k)
    remove_sorted = remove_sorted.at[..., 0].set(False)
    # scatter removal flags back to vocab order
    remove = _scatter_along_last(remove_sorted, order)
    filtered = jnp.where(remove, -jnp.inf, lf)
    filtered = filtered / jnp.clip(temperature, 1e-5, None)
    return jax.nn.softmax(filtered, axis=-1)


def _scatter_along_last(values, indices):
    """out[..., indices[..., i]] = values[..., i]."""
    inv = jnp.argsort(indices, axis=-1)
    return jnp.take_along_axis(values, inv, axis=-1)


def sample_from_probs(key, probs):
    """Gumbel-trick multinomial (`inference.py:43-46`): argmax(p / -log u)."""
    u = jax.random.uniform(
        key, probs.shape, dtype=jnp.float32, minval=jnp.finfo(jnp.float32).tiny
    )
    q = -jnp.log(u)
    return jnp.argmax(probs / q, axis=-1).astype(jnp.int32)


def sample(key, logits, temperature, top_p, top_k):
    """Draw one token per row of logits. Returns int32 (...,)."""
    probs = logits_to_probs(logits, temperature, top_p, top_k)
    return sample_from_probs(key, probs)


TOP_K_CAP = 64  # static top-k width for the fast path (runtime top_k <= cap)


def check_top_k(top_k, k_cap: int = TOP_K_CAP):
    """Host-side validation for the decode fast path's static top-k cap.

    `sample_topk` evaluates the top-p cutoff over only the top-`k_cap`
    logits; a runtime top_k > k_cap would silently clamp AND truncate the
    nucleus for flat distributions. Generation entry points call this with
    the user's Python-int top_k before tracing so the request fails loudly
    instead (`sample()` remains available for full-vocab sampling)."""
    if int(top_k) > k_cap:
        raise ValueError(
            f"top_k={int(top_k)} exceeds the decode fast path's static cap "
            f"{k_cap} (top-p is evaluated over the top-{k_cap} logits). "
            f"Use top_k <= {k_cap}."
        )


def topk_state(logits, k_cap: int = TOP_K_CAP):
    """Precompute the top-k view of logits for (multiple) fast samples.

    Returns (vals (..., k) desc-sorted, idx (..., k), lse (...)).
    Exactly equivalent to the full-sort path whenever top_k <= k_cap: every
    rank >= k_cap is >= top_k and would be filtered anyway. For
    top_k > k_cap the result diverges (the nucleus is truncated at rank
    k_cap); entry points reject such requests via `check_top_k`.
    """
    lf = logits.astype(jnp.float32)
    vals, idx = jax.lax.top_k(lf, min(k_cap, logits.shape[-1]))
    lse = jax.nn.logsumexp(lf, axis=-1)
    return vals, idx, lse


def sample_topk(key, state, temperature, top_p, top_k):
    """Draw one token from a `topk_state`. Returns vocab indices (...,)."""
    vals, idx, lse = state
    k_cap = vals.shape[-1]
    top_k = jnp.minimum(top_k, k_cap)
    probs = jnp.exp(vals - lse[..., None])  # true softmax probs of top-k
    cum = jnp.cumsum(probs, axis=-1)
    ranks = jnp.arange(k_cap)
    remove = (cum > top_p) | (ranks >= top_k)
    remove = remove.at[..., 0].set(False)
    filtered = jnp.where(remove, -jnp.inf, vals)
    filtered = filtered / jnp.clip(temperature, 1e-5, None)
    p = jax.nn.softmax(filtered, axis=-1)
    u = jax.random.uniform(
        key, p.shape, dtype=jnp.float32, minval=jnp.finfo(jnp.float32).tiny
    )
    choice = jnp.argmax(p / -jnp.log(u), axis=-1)
    return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0].astype(
        jnp.int32
    )


def split_keys_rows(keys, n: int):
    """Split a batch of PRNG keys: (B, 2) uint32 -> (B, n, 2)."""
    return jax.vmap(lambda k: jax.random.split(k, n))(keys)


def sample_topk_rows(keys, state, temperature, top_p, top_k):
    """Per-row keyed variant of sample_topk for continuous batching: each
    row has its own PRNG key and (optionally) its own sampling params.

    keys: (B, 2) uint32; temperature/top_p/top_k: scalars or (B,).
    Returns (B,) int32 vocab indices.
    """
    vals, idx, lse = state
    b, k_cap = vals.shape
    temperature = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (b,))
    top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))
    top_k = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (b,))
    top_k = jnp.minimum(top_k, k_cap)

    probs = jnp.exp(vals - lse[..., None])
    cum = jnp.cumsum(probs, axis=-1)
    ranks = jnp.arange(k_cap)[None, :]
    remove = (cum > top_p[:, None]) | (ranks >= top_k[:, None])
    remove = remove.at[:, 0].set(False)
    filtered = jnp.where(remove, -jnp.inf, vals)
    filtered = filtered / jnp.clip(temperature, 1e-5, None)[:, None]
    p = jax.nn.softmax(filtered, axis=-1)
    u = jax.vmap(
        lambda k: jax.random.uniform(
            k, (k_cap,), jnp.float32, minval=jnp.finfo(jnp.float32).tiny
        )
    )(keys)
    choice = jnp.argmax(p / -jnp.log(u), axis=-1)
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(
        jnp.int32
    )


def ras_select(
    token_normal,
    token_high,
    prev_window,
    semantic_begin_id: int,
    semantic_end_id: int,
):
    """Repetition-Aware Sampling: use the high-temperature sample when the
    normal sample is a semantic token that already appears in the rolling
    window (`inference.py:125-144`).

    Args:
      token_normal, token_high: (B,) int32.
      prev_window: (B, W) int32 rolling window of recent main tokens.
    """
    in_window = jnp.any(prev_window == token_normal[:, None], axis=-1)
    is_semantic = (token_normal >= semantic_begin_id) & (
        token_normal <= semantic_end_id
    )
    return jnp.where(in_window & is_semantic, token_high, token_normal)
