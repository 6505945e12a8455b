"""Naive transformer variant: a single stack predicts all codebooks per
position through a `codebook_output` head (no fast transformer).

Reference: `llama.py:614-657` (NaiveTransformer, model_type "naive") —
legacy architecture kept for checkpoint compatibility; the reference's own
inference path only supports DualAR (`inference.py:368-373`), so this
variant supports training/teacher-forced use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import DualARConfig
from fish_speech_tpu.models.dual_ar import (
    _dense,
    _init_layer_stack,
    _lm_head,
    _run_stack_train,
    _slow_spec,
    embed_tokens,
)
from fish_speech_tpu.ops.norms import rms_norm
from fish_speech_tpu.ops.rope import precompute_rope


def init_naive(key, cfg: DualARConfig, dtype=jnp.bfloat16):
    cfg = cfg.resolve()
    keys = jax.random.split(key, 8)
    std = cfg.initializer_range
    params = {
        "embeddings": _dense(keys[0], (cfg.vocab_size, cfg.dim), std, dtype),
        "codebook_embeddings": _dense(
            keys[1], (cfg.codebook_size * cfg.num_codebooks, cfg.dim), std, dtype
        ),
        "layers": _init_layer_stack(
            keys[2], cfg.n_layer, cfg.dim, cfg.n_head, cfg.n_local_heads,
            cfg.head_dim, cfg.intermediate_size, cfg.attention_qkv_bias,
            cfg.attention_o_bias, cfg.attention_qk_norm, std, dtype,
        ),
        "norm": jnp.ones((cfg.dim,), dtype),
        "codebook_norm": jnp.ones((cfg.dim,), dtype),
        "codebook_output": _dense(
            keys[3], (cfg.dim, cfg.codebook_size * cfg.num_codebooks), std, dtype
        ),
    }
    if not cfg.tie_word_embeddings:
        params["output"] = _dense(keys[4], (cfg.dim, cfg.vocab_size), std, dtype)
    return params


def forward_train_naive(params, cfg: DualARConfig, inp, pad_mask=None,
                        remat=False):
    """Teacher-forced forward.

    Returns (token_logits (B,T,V), codebook_logits (B,T,C,K)).
    """
    cfg = cfg.resolve()
    b, _, t = inp.shape
    x = embed_tokens(params, cfg, inp, inference=False)
    freqs = precompute_rope(cfg.max_seq_len, cfg.head_dim, cfg.rope_base)[:t]
    i = jnp.arange(t)
    mask = i[None, :] <= i[:, None]
    if pad_mask is not None:
        mask = mask[None] & ~pad_mask[:, None, :]
    x = _run_stack_train(
        params["layers"], _slow_spec(cfg), x, freqs, mask, cfg.norm_eps, remat
    )
    slow_out = rms_norm(x, params["norm"], cfg.norm_eps)
    token_logits = _lm_head(params, cfg, slow_out)
    cb = rms_norm(x, params["codebook_norm"], cfg.norm_eps)
    codebook_logits = (cb @ params["codebook_output"]).astype(jnp.float32)
    codebook_logits = codebook_logits.reshape(
        b, t, cfg.num_codebooks, cfg.codebook_size
    )
    return token_logits, codebook_logits
