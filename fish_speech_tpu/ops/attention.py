"""Attention ops in (B, T, H, D) layout (no transposes; XLA/MXU-friendly).

A plain einsum attention with fp32 softmax. The Pallas flash kernels in
`fish_speech_tpu.ops.pallas` plug in behind the same signature on TPU.
"""

import math

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative instead of -inf: avoids NaN rows when a
# query has no visible keys (fully masked rows softmax to uniform garbage that
# is itself masked downstream)


def gqa_attention(q, k, v, mask=None, scale=None):
    """Grouped-query attention.

    Args:
      q: (B, T, H, D)
      k, v: (B, S, Hkv, D) with H % Hkv == 0
      mask: bool, broadcastable to (B, T, S) or (T, S); True = attend.
      scale: defaults to 1/sqrt(D).

    Returns: (B, T, H, D) in q's dtype.
    """
    b, t, h, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    g = h // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    qg = q.reshape(b, t, hkv, g, d)
    scores = jnp.einsum(
        "btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if mask is not None:
        while mask.ndim < 3:
            mask = mask[None]
        # (B?, T, S) -> (B?, 1, 1, T, S)
        mask = mask[:, None, None, :, :]
        scores = jnp.where(mask, scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgts,bskd->btkgd", weights, v)
    return out.reshape(b, t, h, d).astype(q.dtype)


def causal_mask(t: int, dtype=bool):
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    return (j <= i).astype(dtype)


def windowed_causal_mask(t: int, window: int):
    """Causal band: position i attends [max(0, i-window+1), i].

    Matches `modded_dac.py:380-398` without materializing a max_len^2 buffer.
    """
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    return (j <= i) & (j >= i - (window - 1))


def gqa_attention_kv8(q, kq, ks, vq, vs, mask=None, scale=None):
    """Grouped-query attention over an int8-quantized KV cache.

    kq/vq: (B, S, Hkv, D) int8; ks/vs: (B, S, Hkv) per-(position, head)
    absmax scales (see `dual_ar._kv_quant`).

    Exact refactor of dequant-then-attend: q.(k_j ks_j) == (q.k_j) ks_j and
    sum_j p_j (v_j vs_j) == sum_j (p_j vs_j) v_j, so the per-position scales
    fold into the scores / probabilities (both only (B, S, Hkv)-sized) and
    the two big matmuls read the int8 arrays directly — XLA fuses the
    int8->bf16 convert into the dot operand load exactly as it does for
    int8 weights. Materializing dequantized k/v instead measured 10%
    SLOWER than a bf16 cache at 8x4k serving (the dequant round-trips
    through HBM); this form is what makes the int8 cache pay.
    """
    b, t, h, d = q.shape
    s, hkv = kq.shape[1], kq.shape[2]
    g = h // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    qg = q.reshape(b, t, hkv, g, d)
    scores = jnp.einsum(
        "btkgd,bskd->bkgts", qg, kq.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    # (B, S, Hkv) -> (B, Hkv, 1, 1, S); fold 1/sqrt(d) in as well
    ks_b = ks.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, None, :]
    scores = scores * (ks_b * scale)
    if mask is not None:
        while mask.ndim < 3:
            mask = mask[None]
        mask = mask[:, None, None, :, :]
        scores = jnp.where(mask, scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    vs_b = vs.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, None, :]
    weights = (weights * vs_b).astype(q.dtype)
    out = jnp.einsum("bkgts,bskd->btkgd", weights, vq.astype(q.dtype))
    return out.reshape(b, t, h, d).astype(q.dtype)
