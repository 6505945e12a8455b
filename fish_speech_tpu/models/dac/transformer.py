"""Window-limited causal transformer used inside the codec.

Reference: `modded_dac.py:97-439` (Transformer / WindowLimitedTransformer,
rope variant, with LayerScale on both residual branches). Channels-last
(B, T, C) throughout; layers stacked + lax.scan like the LM stacks. The
banded causal mask is built on the fly — the reference's 32768x32768 bool
buffer (1 GB) is deliberately not reproduced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from fish_speech_tpu.config import CodecTransformerConfig
from fish_speech_tpu.ops.attention import gqa_attention, windowed_causal_mask
from fish_speech_tpu.ops.norms import rms_norm
from fish_speech_tpu.ops.rope import apply_rope, precompute_rope


def init_codec_transformer(key, cfg: CodecTransformerConfig, input_dim: int,
                           std: float = 0.02, dtype=jnp.float32):
    cfg = cfg.resolve()
    keys = jax.random.split(key, 8)
    L = cfg.n_layer
    total_qkv = (cfg.n_head + 2 * cfg.n_local_heads) * cfg.head_dim

    def dense(k, shape):
        return (jax.random.truncated_normal(k, -2, 2, shape, jnp.float32) * std).astype(dtype)

    params = {
        "layers": {
            "attn_norm": jnp.ones((L, cfg.dim), dtype),
            "wqkv": dense(keys[0], (L, cfg.dim, total_qkv)),
            "wo": dense(keys[1], (L, cfg.n_head * cfg.head_dim, cfg.dim)),
            "attn_scale": jnp.full((L, cfg.dim), 1e-2, dtype),
            "ffn_norm": jnp.ones((L, cfg.dim), dtype),
            "w1": dense(keys[2], (L, cfg.dim, cfg.intermediate_size)),
            "w3": dense(keys[3], (L, cfg.dim, cfg.intermediate_size)),
            "w2": dense(keys[4], (L, cfg.intermediate_size, cfg.dim)),
            "ffn_scale": jnp.full((L, cfg.dim), 1e-2, dtype),
        },
        "norm": jnp.ones((cfg.dim,), dtype),
    }
    if input_dim != cfg.dim:
        params["input_proj"] = {
            "w": dense(keys[5], (input_dim, cfg.dim)),
            "b": jnp.zeros((cfg.dim,), dtype),
        }
        params["output_proj"] = {
            "w": dense(keys[6], (cfg.dim, input_dim)),
            "b": jnp.zeros((input_dim,), dtype),
        }
    return params


def codec_transformer(params, cfg: CodecTransformerConfig, x):
    """Apply the transformer. x: (B, T, C_in) -> (B, T, C_in)."""
    cfg = cfg.resolve()
    if "input_proj" in params:
        x = x @ params["input_proj"]["w"] + params["input_proj"]["b"]

    t = x.shape[1]
    # bf16 table: the reference registers its codec rope buffer in bfloat16
    # (`modded_dac.py:108-112` + `precompute_freqs_cis` default dtype), so the
    # trained checkpoints saw bf16-rounded angles; apply_rope upcasts to f32.
    freqs = precompute_rope(t, cfg.head_dim, cfg.rope_base, dtype=jnp.bfloat16)
    if cfg.window_size is not None:
        mask = windowed_causal_mask(t, cfg.window_size)
    else:
        i = jnp.arange(t)
        mask = i[None, :] <= i[:, None]

    n_head, n_kv, head_dim = cfg.n_head, cfg.n_local_heads, cfg.head_dim
    q_size = n_head * head_dim
    kv_size = n_kv * head_dim

    def body(carry, lp):
        h = rms_norm(carry, lp["attn_norm"], cfg.norm_eps)
        qkv = h @ lp["wqkv"]
        b, s, _ = qkv.shape
        q = qkv[..., :q_size].reshape(b, s, n_head, head_dim)
        k = qkv[..., q_size : q_size + kv_size].reshape(b, s, n_kv, head_dim)
        v = qkv[..., q_size + kv_size :].reshape(b, s, n_kv, head_dim)
        q = apply_rope(q, freqs)
        k = apply_rope(k, freqs)
        y = gqa_attention(q, k, v, mask)
        y = y.reshape(b, s, -1) @ lp["wo"]
        carry = carry + y * lp["attn_scale"]
        h2 = rms_norm(carry, lp["ffn_norm"], cfg.norm_eps)
        ffn = (jax.nn.silu(h2 @ lp["w1"]) * (h2 @ lp["w3"])) @ lp["w2"]
        return carry + ffn * lp["ffn_scale"], None

    x, _ = lax.scan(body, x, params["layers"])
    x = rms_norm(x, params["norm"], cfg.norm_eps)

    if "output_proj" in params:
        x = x @ params["output_proj"]["w"] + params["output_proj"]["b"]
    return x
