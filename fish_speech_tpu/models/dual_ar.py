"""Dual-AR text->semantic transformer, functional JAX.

The slow transformer predicts one semantic codebook over time; the fast
transformer predicts the remaining codebooks across the codebook axis per
frame. Reference architecture: `fish_speech/models/text2semantic/llama.py`
(DualARTransformer); this is a TPU-first re-design:

  * parameters are plain pytrees with all transformer layers STACKED on a
    leading axis, so the layer loop is a single `lax.scan` (one compiled
    block regardless of depth — fast compiles, great for pipelining);
  * the KV cache is a functional value threaded through the step functions
    (no module state); decode writes via `dynamic_update_slice`;
  * prefill attends its own fresh K/V (never the padded cache), decode
    attends the cache under a position mask — both shapes static;
  * weights are stored (in, out) so every matmul is `x @ w` (MXU-native).

Weight layout (all leaves jnp arrays; L = n_layer stacked axis):
  embeddings            (V, D)
  codebook_embeddings   (C*K, D)
  layers/attn_norm      (L, D)
  layers/wqkv           (L, D, (H + 2*Hkv) * Dh)   [+ bqkv]
  layers/q_norm, k_norm (L, Dh)                     [if qk_norm]
  layers/wo             (L, H*Dh, D)                [+ bo]
  layers/ffn_norm       (L, D)
  layers/w1, w3         (L, D, I)
  layers/w2             (L, I, D)
  norm                  (D,)
  output                (D, V)                      [if untied]
  fast/project_in/{w,b} (D, Df), (Df,)              [if Df != D]
  fast/embeddings       (K, Df)
  fast/layers/...       (same structure, Lf stacked)
  fast/norm             (Df,)
  fast/output           (Df, K)
"""

from __future__ import annotations

import logging
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from fish_speech_tpu.config import DualARConfig
from fish_speech_tpu.ops.attention import (NEG_INF, gqa_attention,
                                           gqa_attention_kv8)
from fish_speech_tpu.ops.norms import rms_norm
from fish_speech_tpu.ops.quant import mm
from fish_speech_tpu.ops.rope import apply_rope, precompute_rope

# Flash-prefill dispatch (read at trace time by `prefill`): "auto" uses the
# Pallas kernel on TPU for prompts >= 512 tokens; "interpret" forces the
# kernel in interpret mode (lets CPU tests measure the flash/XLA numerics
# boundary the prefix-cache hit path crosses); "off" forces XLA attention.
FLASH_PREFILL = "auto"

# Flash-train dispatch (read at trace time by `_block_train`): "auto" uses
# the Pallas training kernels (ops/pallas_attention_train.py — fwd + bwd,
# scores VMEM-resident) on a SINGLE TPU device for sequences >= 512;
# "interpret" forces them in interpret mode (CPU gradient-parity tests);
# "off" forces the XLA einsum path. Multi-device training keeps the XLA
# path: pallas_call has no GSPMD partitioning rule, so under a mesh the
# kernel would silently force a gather of the sharded operands.
FLASH_TRAIN = "auto"

# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _dense(key, shape, std, dtype):
    return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)


def _init_layer_stack(key, n_layer, dim, n_head, n_kv, head_dim, inter,
                      qkv_bias, o_bias, qk_norm, std, dtype):
    keys = jax.random.split(key, 5)
    total_qkv = (n_head + 2 * n_kv) * head_dim
    layers = {
        "attn_norm": jnp.ones((n_layer, dim), dtype),
        "wqkv": _dense(keys[0], (n_layer, dim, total_qkv), std, dtype),
        "wo": _dense(keys[1], (n_layer, n_head * head_dim, dim), std, dtype),
        "ffn_norm": jnp.ones((n_layer, dim), dtype),
        "w1": _dense(keys[2], (n_layer, dim, inter), std, dtype),
        "w3": _dense(keys[3], (n_layer, dim, inter), std, dtype),
        "w2": _dense(keys[4], (n_layer, inter, dim), std, dtype),
    }
    if qkv_bias:
        layers["bqkv"] = jnp.zeros((n_layer, total_qkv), dtype)
    if o_bias:
        layers["bo"] = jnp.zeros((n_layer, dim), dtype)
    if qk_norm:
        layers["q_norm"] = jnp.ones((n_layer, head_dim), dtype)
        layers["k_norm"] = jnp.ones((n_layer, head_dim), dtype)
    return layers


def init_dual_ar(key, cfg: DualARConfig, dtype=jnp.bfloat16):
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
        "fast": {
            "embeddings": _dense(keys[3], (cfg.codebook_size, cfg.fast_dim), std, dtype),
            "layers": _init_layer_stack(
                keys[4], cfg.n_fast_layer, cfg.fast_dim, cfg.fast_n_head,
                cfg.fast_n_local_heads, cfg.fast_head_dim,
                cfg.fast_intermediate_size, cfg.fast_attention_qkv_bias,
                cfg.fast_attention_o_bias, cfg.fast_attention_qk_norm, std, dtype,
            ),
            "norm": jnp.ones((cfg.fast_dim,), dtype),
            "output": _dense(keys[5], (cfg.fast_dim, cfg.codebook_size), std, dtype),
        },
    }
    if not cfg.tie_word_embeddings:
        params["output"] = _dense(keys[6], (cfg.dim, cfg.vocab_size), std, dtype)
    if cfg.audio_feature_dim > 0:
        params["audio_projector"] = {
            "w": _dense(jax.random.fold_in(keys[6], 1),
                        (cfg.audio_feature_dim, cfg.dim), std, dtype),
            "b": jnp.zeros((cfg.dim,), dtype),
        }
    if cfg.fast_dim != cfg.dim:
        params["fast"]["project_in"] = {
            "w": _dense(keys[7], (cfg.dim, cfg.fast_dim), std, dtype),
            "b": jnp.zeros((cfg.fast_dim,), dtype),
        }
    return params


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(cfg: DualARConfig, batch: int, max_seq: int, dtype=jnp.bfloat16,
                  quant: bool = False):
    """Static slow-transformer cache: (L, B, S, Hkv, Dh) per of k/v.

    quant=True stores k/v int8 with per-(position, head) absmax scales
    ("ks"/"vs", (L, B, S, Hkv) bf16) — halves decode KV reads, which rival
    weight reads at large batch x context (16 x 2048: 4.8 GB vs 7.8 GB per
    step). Prefill attends FRESH bf16 k/v and only the cache store is
    quantized, so prefill logits are exact; only decode attention sees the
    ~0.4% rounding. Opt-in (GenerationSession/ContinuousBatcher kv_quant);
    accuracy pinned by tests/test_kv_quant.py."""
    cfg = cfg.resolve()
    shape = (cfg.n_layer, batch, max_seq, cfg.n_local_heads, cfg.head_dim)
    if quant:
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "ks": jnp.zeros(shape[:-1], jnp.bfloat16),
            "vs": jnp.zeros(shape[:-1], jnp.bfloat16),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _kv_quant(x):
    """Per-(position, head) absmax int8: (..., D) -> (int8 (..., D), scales (...))."""
    xf = x.astype(jnp.float32)
    a = jnp.max(jnp.abs(xf), axis=-1)
    s = a / 127.0
    q = jnp.round(xf / jnp.maximum(s, 1e-8)[..., None])
    return q.astype(jnp.int8), s.astype(jnp.bfloat16)


def _kv_dequant(q, s, dtype):
    """Inverse of _kv_quant; fuses into the consuming attention matmul."""
    return (q.astype(jnp.float32) * s[..., None].astype(jnp.float32)).astype(dtype)


def init_fast_kv_cache(cfg: DualARConfig, batch: int, dtype=jnp.bfloat16):
    """Fast-transformer cache: sequence axis = codebook index (length C)."""
    cfg = cfg.resolve()
    shape = (
        cfg.n_fast_layer,
        batch,
        cfg.num_codebooks,
        cfg.fast_n_local_heads,
        cfg.fast_head_dim,
    )
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------


def embed_tokens(params, cfg: DualARConfig, inp, audio_features=None,
                 audio_mask=None, inference=True):
    """Token + summed codebook embedding, gated by the semantic id range.

    Args:
      inp: (B, C+1, T) int32 — row 0 text ids, rows 1..C codebook values.
      audio_features: optional (B, T, F) continuous features, aligned with
        the sequence (zeros at non-audio positions; see
        `sequence.align_audio_features`).
      audio_mask: (B, T) bool, True where an audio feature replaces the
        token embedding.
      inference: the reference applies `scale_codebook_embeddings` only on
        the generate path (`llama.py:415-419`), NOT in its training `embed()`
        (`llama.py:326-345`); `forward_train` passes False to byte-match the
        reference trainer's gradients for scaled checkpoints.
    Returns (B, T, D).

    Reference: `llama.py:326-345, 399-433`. The reference's audio branch is
    dead code (no `audio_projector` in its checkpoints/init, and its
    `ContentSequence.encode` raises on AudioPart); here the intended
    semantics are implemented: projected features REPLACE the embedding at
    masked positions, scaled by 1/sqrt(2) when `scale_codebook_embeddings`.
    """
    codes = inp[:, 1:, :]  # (B, C, T)
    offsets = (jnp.arange(cfg.num_codebooks) * cfg.codebook_size)[None, :, None]
    cb_idx = codes + offsets
    cb = jnp.take(params["codebook_embeddings"], cb_idx, axis=0)
    if "lora_codebook_embeddings" in params:
        la = params["lora_codebook_embeddings"]
        cb = cb + cfg.lora_scale * (jnp.take(la["a"], cb_idx, axis=0) @ la["b"])
    vq_sum = cb.sum(axis=1)  # (B, T, D)

    main = inp[:, 0, :]
    is_semantic = (main >= cfg.semantic_begin_id) & (main <= cfg.semantic_end_id)
    vq_sum = jnp.where(is_semantic[..., None], vq_sum, 0)

    x = jnp.take(params["embeddings"], main, axis=0)
    if "lora_embeddings" in params:
        la = params["lora_embeddings"]
        x = x + cfg.lora_scale * (jnp.take(la["a"], main, axis=0) @ la["b"])
    x = x + vq_sum
    if cfg.scale_codebook_embeddings and inference:
        scale = 1.0 / math.sqrt(cfg.num_codebooks + 1)
        x = jnp.where(is_semantic[..., None], x * scale, x)

    if audio_features is not None:
        if "audio_projector" not in params:
            # reference behavior: warn and ignore (`llama.py:433`)
            logging.getLogger(__name__).warning(
                "audio_features provided but model has no audio_projector"
            )
        else:
            ap = params["audio_projector"]
            if audio_features.shape[-1] != ap["w"].shape[0]:
                raise ValueError(
                    f"audio_features dim {audio_features.shape[-1]} != "
                    f"audio_feature_dim {ap['w'].shape[0]}"
                )
            proj = audio_features.astype(x.dtype) @ ap["w"] + ap["b"]
            if cfg.scale_codebook_embeddings:
                proj = proj / math.sqrt(2)
            if audio_mask is None:
                raise ValueError("audio_features requires audio_mask")
            x = jnp.where(audio_mask[..., None], proj, x)
    return x


# ---------------------------------------------------------------------------
# Transformer blocks (shared by slow and fast stacks)
# ---------------------------------------------------------------------------


def _lora_delta(lp, name, x, scale):
    """Low-rank delta `scale * (x @ A) @ B` when this weight has LoRA."""
    lora = lp.get("lora")
    if isinstance(lora, dict) and name in lora:
        return scale * ((x @ lora[name]["a"]) @ lora[name]["b"])
    return 0


def _qkv(lp, spec, h):
    """Project + split + per-head norm + shape. Returns q,k,v (B,T,H*,Dh)."""
    n_head, n_kv, head_dim, eps, lora_scale = spec
    qkv = mm(h, lp["wqkv"]) + _lora_delta(lp, "wqkv", h, lora_scale)
    if "bqkv" in lp:
        qkv = qkv + lp["bqkv"]
    b, t, _ = qkv.shape
    q_size = n_head * head_dim
    kv_size = n_kv * head_dim
    q = qkv[..., :q_size].reshape(b, t, n_head, head_dim)
    k = qkv[..., q_size : q_size + kv_size].reshape(b, t, n_kv, head_dim)
    v = qkv[..., q_size + kv_size :].reshape(b, t, n_kv, head_dim)
    if "q_norm" in lp:
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
    return q, k, v


def _attn_out(lp, spec, y):
    """Output projection with optional bias/LoRA. y: (B, T, H*Dh)."""
    lora_scale = spec[4]
    out = mm(y, lp["wo"]) + _lora_delta(lp, "wo", y, lora_scale)
    if "bo" in lp:
        out = out + lp["bo"]
    return out


def _ffn(lp, spec, h2):
    lora_scale = spec[4]
    if "w13" in lp:
        # Inference-fused gate+up projection (`fuse_ffn_weights`): one
        # (D, 2I) matmul instead of two (D, I) — at batch-1 decode both
        # read the same weight bytes but the fused op streams them in one
        # DMA burst (measured +16 GB/s on v5e, ~0.3 ms/frame on the
        # flagship). Per-column math identical to the split form.
        u = mm(h2, lp["w13"])
        i = u.shape[-1] // 2
        u1 = u[..., :i] + _lora_delta(lp, "w1", h2, lora_scale)
        u3 = u[..., i:] + _lora_delta(lp, "w3", h2, lora_scale)
    else:
        u1 = mm(h2, lp["w1"]) + _lora_delta(lp, "w1", h2, lora_scale)
        u3 = mm(h2, lp["w3"]) + _lora_delta(lp, "w3", h2, lora_scale)
    g = jax.nn.silu(u1) * u3
    return mm(g, lp["w2"]) + _lora_delta(lp, "w2", g, lora_scale)


def _block_train(lp, spec, x, freqs, mask, eps, kvalid=None):
    """One pre-norm block, self-attention over x itself (no cache).

    When `kvalid` (B, T) is given and the flash-train dispatch engages
    (TPU, single device, T >= 512), attention runs through the Pallas
    training kernel (`ops.pallas_attention_train`) — scores never leave
    VMEM in either direction; `mask` must then be exactly
    causal & kvalid, which is what `forward_train` builds.
    """
    h = rms_norm(x, lp["attn_norm"], eps)
    q, k, v = _qkv(lp, spec, h)
    q = apply_rope(q, freqs)
    k = apply_rope(k, freqs)
    t = x.shape[1]
    if FLASH_TRAIN == "auto":
        use_flash = (
            kvalid is not None and t >= 512 and t % 128 == 0
            and jax.default_backend() == "tpu" and jax.device_count() == 1
        )
    else:
        use_flash = FLASH_TRAIN == "interpret" and kvalid is not None
    if use_flash:
        from fish_speech_tpu.ops.pallas_attention_train import (
            flash_train_attention,
        )

        y = flash_train_attention(q, k, v, kvalid,
                                  FLASH_TRAIN == "interpret")
    else:
        y = gqa_attention(q, k, v, mask)
    b, t = y.shape[:2]
    x = x + _attn_out(lp, spec, y.reshape(b, t, -1))
    h2 = rms_norm(x, lp["ffn_norm"], eps)
    return x + _ffn(lp, spec, h2)


def _run_stack_train(layers, spec, x, freqs, mask, eps, remat=False,
                     kvalid=None):
    def body(carry, lp):
        return _block_train(lp, spec, carry, freqs, mask, eps, kvalid), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = lax.scan(body, x, layers)
    return x


def _layer_slice(layers, i):
    """Dynamic-index the stacked layer pytree at layer i (handles quantized
    dicts and LoRA subtrees transparently)."""
    return jax.tree_util.tree_map(
        lambda a: lax.dynamic_index_in_dim(a, i, 0, keepdims=False), layers
    )


def _run_stack_decode(layers, spec, x, freqs, cache, pos, kv_mask,
                      kv_len=None, write_rows=None, active=None,
                      unroll=1):
    """Decode-mode layer loop with the GLOBAL cache carried in place.

    A scan that emits per-layer updated caches as stacked outputs forces XLA
    to rewrite the ENTIRE cache every step (a 1.2 GB copy per step at 4B/4k —
    it dominated batched decode). Instead: fori_loop over layers with the
    full (L, B, S, H, D) cache in the carry — XLA aliases while-loop carries,
    so the per-layer update is a genuine in-place row write; attention reads
    the (kv_len-bounded) slice of the current layer only.

    write_rows: None for lockstep (scalar pos write at all rows), or
    (rows, per-row-pos, active) for the continuous-batching path.
    """
    kc_all, vc_all = cache["k"], cache["v"]
    quant = "ks" in cache  # int8 KV: scales ride along in the carry
    ks_all = cache.get("ks")
    vs_all = cache.get("vs")
    n_layer = kc_all.shape[0]
    b = x.shape[0]
    s = kc_all.shape[2]
    read_len = kv_len if kv_len is not None else s
    eps = spec[3]

    def body(i, carry):
        if quant:
            x, kc_all, vc_all, ks_all, vs_all = carry
        else:
            x, kc_all, vc_all = carry
        lp = _layer_slice(layers, i)
        h = rms_norm(x, lp["attn_norm"], eps)
        q, k, v = _qkv(lp, spec, h)
        if freqs.ndim == 4:  # per-row frequencies (continuous batching)
            q = _rope_rows(q, freqs)
            k = _rope_rows(k, freqs)
        else:
            q = apply_rope(q, freqs)
            k = apply_rope(k, freqs)

        if quant:
            kw, ksc = _kv_quant(k)
            vw, vsc = _kv_quant(v)
        else:
            kw, vw = k, v

        if write_rows is None:
            # lockstep: one shared position
            kc_all = lax.dynamic_update_slice(
                kc_all, kw[None].astype(kc_all.dtype), (i, 0, pos, 0, 0)
            )
            vc_all = lax.dynamic_update_slice(
                vc_all, vw[None].astype(vc_all.dtype), (i, 0, pos, 0, 0)
            )
            if quant:
                ks_all = lax.dynamic_update_slice(
                    ks_all, ksc[None].astype(ks_all.dtype), (i, 0, pos, 0)
                )
                vs_all = lax.dynamic_update_slice(
                    vs_all, vsc[None].astype(vs_all.dtype), (i, 0, pos, 0)
                )
        else:
            rows, row_pos, act = write_rows
            old_k = kc_all[i, rows, row_pos]
            old_v = vc_all[i, rows, row_pos]
            new_k = jnp.where(act[:, None, None], kw[:, 0].astype(kc_all.dtype), old_k)
            new_v = jnp.where(act[:, None, None], vw[:, 0].astype(vc_all.dtype), old_v)
            kc_all = kc_all.at[i, rows, row_pos].set(new_k)
            vc_all = vc_all.at[i, rows, row_pos].set(new_v)
            if quant:
                new_ks = jnp.where(act[:, None], ksc[:, 0].astype(ks_all.dtype),
                                   ks_all[i, rows, row_pos])
                new_vs = jnp.where(act[:, None], vsc[:, 0].astype(vs_all.dtype),
                                   vs_all[i, rows, row_pos])
                ks_all = ks_all.at[i, rows, row_pos].set(new_ks)
                vs_all = vs_all.at[i, rows, row_pos].set(new_vs)

        kcl = lax.dynamic_slice(
            kc_all, (i, 0, 0, 0, 0),
            (1, b, read_len) + kc_all.shape[3:],
        )[0]
        vcl = lax.dynamic_slice(
            vc_all, (i, 0, 0, 0, 0),
            (1, b, read_len) + vc_all.shape[3:],
        )[0]
        if quant:
            ksl = lax.dynamic_slice(
                ks_all, (i, 0, 0, 0), (1, b, read_len, ks_all.shape[3])
            )[0]
            vsl = lax.dynamic_slice(
                vs_all, (i, 0, 0, 0), (1, b, read_len, vs_all.shape[3])
            )[0]
            y = gqa_attention_kv8(q, kcl, ksl, vcl, vsl,
                                  kv_mask[..., :read_len])
        else:
            y = gqa_attention(q, kcl, vcl, kv_mask[..., :read_len])
        x = x + _attn_out(lp, spec, y.reshape(b, x.shape[1], -1))
        h2 = rms_norm(x, lp["ffn_norm"], eps)
        x = x + _ffn(lp, spec, h2)
        if quant:
            return (x, kc_all, vc_all, ks_all, vs_all)
        return (x, kc_all, vc_all)

    # Measured on v5e (single-stream int8 flagship): unrolling this loop
    # does NOT help — 2/4 on the slow stack and full unroll on the 4-layer
    # fast stack each measured ~1-3% SLOWER than the rolled form. Decode is
    # HBM-bound and XLA already overlaps the next layer's weight DMA with
    # compute inside the while loop; unrolling just grows the program.
    # Re-measured post-w13-fusion (unroll=12 fast layers + unroll=3 on the
    # codebook scan): 66.4 f/s vs 71.6 rolled — still ~7% SLOWER.
    if quant:
        x, kc_all, vc_all, ks_all, vs_all = lax.fori_loop(
            0, n_layer, body, (x, kc_all, vc_all, ks_all, vs_all),
            unroll=unroll,
        )
        return x, {"k": kc_all, "v": vc_all, "ks": ks_all, "vs": vs_all}
    x, kc_all, vc_all = lax.fori_loop(0, n_layer, body, (x, kc_all, vc_all),
                                      unroll=unroll)
    return x, {"k": kc_all, "v": vc_all}


def _slow_spec(cfg: DualARConfig):
    return (cfg.n_head, cfg.n_local_heads, cfg.head_dim, cfg.norm_eps,
            cfg.lora_scale)


def _fast_spec(cfg: DualARConfig):
    return (cfg.fast_n_head, cfg.fast_n_local_heads, cfg.fast_head_dim,
            cfg.norm_eps, cfg.lora_scale)


# ---------------------------------------------------------------------------
# Training forward
# ---------------------------------------------------------------------------


def forward_train(
    params,
    cfg: DualARConfig,
    inp,
    labels=None,
    pad_mask=None,
    remat: Optional[bool] = None,
    audio_features=None,
    audio_mask=None,
):
    """Full teacher-forced forward.

    Args:
      inp: (B, C+1, T) int32 inputs.
      labels: (B, C+1, T) int32 labels (used for fast teacher forcing; row 0
        drives which positions matter — the loss fn applies that mask).
      pad_mask: (B, T) bool, True where PADDING.
      audio_features/audio_mask: optional continuous conditioning; see
        `embed_tokens`.

    Returns:
      token_logits: (B, T, V) fp32
      codebook_logits: (B, T, C, K) fp32 — fast logits computed at every
        position; the loss gathers the semantic positions. (The reference
        gathers positions first (`llama.py:752-790`), a dynamic shape; on TPU
        we keep shapes static and mask in the loss.)
    """
    cfg = cfg.resolve()
    if remat is None:
        remat = cfg.use_gradient_checkpointing
    b, _, t = inp.shape

    x = embed_tokens(params, cfg, inp, audio_features, audio_mask,
                     inference=False)
    freqs = precompute_rope(cfg.max_seq_len, cfg.head_dim, cfg.rope_base)[:t]
    i = jnp.arange(t)
    mask = i[None, :] <= i[:, None]  # (T, T) causal
    if pad_mask is not None:
        mask = mask[None] & ~pad_mask[:, None, :]
        kvalid = ~pad_mask
    else:
        kvalid = jnp.ones((b, t), bool)

    x = _run_stack_train(
        params["layers"], _slow_spec(cfg), x, freqs, mask, cfg.norm_eps,
        remat, kvalid=kvalid,
    )
    slow_out = rms_norm(x, params["norm"], cfg.norm_eps)
    token_logits = _lm_head(params, cfg, slow_out)

    hidden = slow_out if cfg.norm_fastlayer_input else x

    # Teacher-forced fast pass over all positions.
    if labels is None:
        labels = inp
    teacher = jnp.clip(labels[:, 1:-1, :], 0, cfg.codebook_size - 1)  # (B, C-1, T)
    teacher = jnp.transpose(teacher, (0, 2, 1)).reshape(b * t, cfg.num_codebooks - 1)
    codebook_logits = fast_forward_train(
        params, cfg, hidden.reshape(b * t, cfg.dim), teacher, remat
    )
    return token_logits, codebook_logits.reshape(
        b, t, cfg.num_codebooks, cfg.codebook_size
    )


def _lm_head(params, cfg: DualARConfig, slow_out):
    if cfg.tie_word_embeddings:
        logits = slow_out @ params["embeddings"].T
        if "lora_embeddings" in params:
            la = params["lora_embeddings"]
            logits = logits + cfg.lora_scale * (
                (slow_out @ la["b"].T) @ la["a"].T
            )
    else:
        logits = mm(slow_out, params["output"])
        if "lora_output" in params:
            la = params["lora_output"]
            logits = logits + cfg.lora_scale * ((slow_out @ la["a"]) @ la["b"])
    return logits.astype(jnp.float32)


def fast_project_in(params, cfg: DualARConfig, hidden):
    if "project_in" in params["fast"]:
        p = params["fast"]["project_in"]
        return hidden @ p["w"] + p["b"]
    return hidden


def fast_embed(params, cfg: DualARConfig, codes):
    """Fast-codebook embedding lookup with optional LoRA."""
    emb = jnp.take(params["fast"]["embeddings"], codes, axis=0)
    if "lora_embeddings" in params["fast"]:
        la = params["fast"]["lora_embeddings"]
        emb = emb + cfg.lora_scale * (jnp.take(la["a"], codes, axis=0) @ la["b"])
    return emb


def _fast_head(params, cfg: DualARConfig, out):
    logits = mm(out, params["fast"]["output"])
    if "lora_output" in params["fast"]:
        la = params["fast"]["lora_output"]
        logits = logits + cfg.lora_scale * ((out @ la["a"]) @ la["b"])
    return logits.astype(jnp.float32)


def fast_forward_train(params, cfg: DualARConfig, hidden, codebooks, remat=False):
    """Teacher-forced fast transformer.

    Args:
      hidden: (N, D) slow hidden states at frame positions.
      codebooks: (N, C-1) int32 ground-truth codebooks 0..C-2.
    Returns (N, C, K) fp32 logits: position i predicts codebook i.
    """
    cfg = cfg.resolve()
    x0 = fast_project_in(params, cfg, hidden)
    emb = fast_embed(params, cfg, codebooks)
    x = jnp.concatenate([x0[:, None, :].astype(emb.dtype), emb], axis=1)  # (N, C, Df)

    c = cfg.num_codebooks
    freqs = precompute_rope(c, cfg.fast_head_dim, cfg.rope_base)
    i = jnp.arange(c)
    mask = i[None, :] <= i[:, None]
    x = _run_stack_train(
        params["fast"]["layers"], _fast_spec(cfg), x, freqs, mask, cfg.norm_eps, remat
    )
    out = rms_norm(x, params["fast"]["norm"], cfg.norm_eps)
    return _fast_head(params, cfg, out)


# ---------------------------------------------------------------------------
# Inference: prefill and single-step decode primitives
# ---------------------------------------------------------------------------


def _prefill_tail(params, cfg: DualARConfig, x, t_end, cache):
    """Shared prefill epilogue: last-real-position extraction, final norm,
    LM head. Used by `prefill` and `prefill_suffix` so the two paths can
    never diverge."""
    b = x.shape[0]
    t_last = jnp.broadcast_to(jnp.asarray(t_end, jnp.int32) - 1, (b,))
    idx = t_last.reshape(b, 1, 1)
    x_last = jnp.take_along_axis(x, idx, axis=1)[:, 0]  # (B, D)
    slow_out = rms_norm(x_last, params["norm"], cfg.norm_eps)
    logits = _lm_head(params, cfg, slow_out[:, None])[:, 0]
    hidden = slow_out if cfg.norm_fastlayer_input else x_last
    return logits, hidden, cache


def prefill(params, cfg: DualARConfig, inp, cache, offsets, t_end,
            audio_features=None, audio_mask=None):
    """Run the prompt through the slow transformer, filling the KV cache.

    Args:
      inp: (B, C+1, Tpad) prompt matrix. Row i's prompt is LEFT-aligned to a
        common end: it occupies positions [offsets[i], t_end); slots before
        the offset are pad (masked), slots in [t_end, Tpad) are bucket tail
        (never attended by real queries, overwritten by decode steps before
        any decode query can see them).
      cache: slow KV cache dict, seq axis >= Tpad.
      offsets: (B,) int32 per-row start positions (0 for single-stream).
      t_end: scalar int32 — common end position — or (B,) int32 per-row end
        positions (right-aligned prompts at [0, t_end[i]); used by the
        continuous-batching group prefill, where each row keeps its own
        position counter so no common end is needed). Logits/hidden are
        taken at t_end - 1 (per row).

    Returns (logits_last (B, V fp32), hidden_last (B, D), cache).
    Left-alignment keeps RoPE relative distances exact within each row for
    mixed-length lockstep batches (the gap sits BEFORE the prompt). With
    per-row t_end and zero offsets, the plain causal mask already isolates
    each prompt: pad slots sit AFTER a row's prompt, are never attended by
    its real queries, and are overwritten by decode before they become
    visible.
    """
    cfg = cfg.resolve()
    b, _, t = inp.shape
    x = embed_tokens(params, cfg, inp, audio_features, audio_mask)
    freqs = precompute_rope(cfg.max_seq_len, cfg.head_dim, cfg.rope_base)[:t]

    # XLA attention materializes (B,H,T,T) fp32 scores; the Pallas flash
    # kernel keeps them in VMEM. Use it on TPU for long prompts.
    if FLASH_PREFILL == "auto":
        use_flash = t >= 512 and jax.default_backend() == "tpu"
    else:
        use_flash = FLASH_PREFILL == "interpret"
    i = jnp.arange(t)
    mask = (i[None, :] <= i[:, None])[None] & (
        i[None, None, :] >= offsets[:, None, None]
    )

    s = cache["k"].shape[2]
    # Fresh-KV attention: build per-layer k/v, attend, and also store to cache.
    spec = _slow_spec(cfg)

    quant = "ks" in cache  # int8 KV: store quantized, attend FRESH bf16 k/v

    def body(carry, xs):
        if quant:
            lp, kc, vc, ks, vs = xs
        else:
            lp, kc, vc = xs
        h = rms_norm(carry, lp["attn_norm"], cfg.norm_eps)
        q, k, v = _qkv(lp, spec, h)
        q = apply_rope(q, freqs)
        k = apply_rope(k, freqs)
        if quant:
            kw, ksc = _kv_quant(k)
            vw, vsc = _kv_quant(v)
            kc = lax.dynamic_update_slice(kc, kw, (0, 0, 0, 0))
            vc = lax.dynamic_update_slice(vc, vw, (0, 0, 0, 0))
            ks = lax.dynamic_update_slice(ks, ksc.astype(ks.dtype), (0, 0, 0))
            vs = lax.dynamic_update_slice(vs, vsc.astype(vs.dtype), (0, 0, 0))
        else:
            kc = lax.dynamic_update_slice(kc, k.astype(kc.dtype), (0, 0, 0, 0))
            vc = lax.dynamic_update_slice(vc, v.astype(vc.dtype), (0, 0, 0, 0))
        if use_flash:
            from fish_speech_tpu.ops.pallas_attention import (
                flash_prefill_attention,
            )

            y = flash_prefill_attention(
                q, k, v, offsets, interpret=FLASH_PREFILL == "interpret"
            )
        else:
            y = gqa_attention(q, k, v, mask)
        carry = carry + _attn_out(lp, spec, y.reshape(b, t, -1))
        h2 = rms_norm(carry, lp["ffn_norm"], cfg.norm_eps)
        out = carry + _ffn(lp, spec, h2)
        return out, (kc, vc, ks, vs) if quant else (kc, vc)

    if quant:
        x, (k_new, v_new, ks_new, vs_new) = lax.scan(
            body, x,
            (params["layers"], cache["k"], cache["v"], cache["ks"], cache["vs"]),
        )
        cache = {"k": k_new, "v": v_new, "ks": ks_new, "vs": vs_new}
    else:
        x, (k_new, v_new) = lax.scan(
            body, x, (params["layers"], cache["k"], cache["v"])
        )
        cache = {"k": k_new, "v": v_new}

    return _prefill_tail(params, cfg, x, t_end, cache)


def prefill_suffix(params, cfg: DualARConfig, inp, cache, start_pos, t_end,
                   kv_len):
    """Prefill only a prompt SUFFIX against an already-filled cache prefix.

    The voice-clone prefix-caching path (reference only gets this via
    SGLang's radix cache): positions [0, start_pos) of the cache hold the
    KV of a previously-prefilled shared prompt prefix — valid for ANY
    request sharing those prompt columns, because causal attention makes
    k/v at position j depend only on tokens 0..j. This runs the remaining
    columns as one multi-token decode-style pass: fresh q/k/v for the
    suffix, writes at [start_pos, start_pos+Ts), attention over the cache
    under the absolute causal mask j <= start_pos + i.

    Args:
      inp: (B, C+1, Ts) suffix columns, real length t_end, bucket-padded.
        Pad-tail writes land in [start_pos+t_end, start_pos+Ts) — masked
        exactly like the full-prefill bucket tail (decode overwrites them
        before any query can attend them).
      start_pos: scalar int32 absolute position of the first suffix column.
      t_end: scalar int32 — real suffix length; logits taken at
        start_pos + t_end - 1.
      kv_len: static int — attention reads cache[:kv_len]
        (>= start_pos + Ts).

    Returns (logits_last (B, V fp32), hidden_last (B, D), cache).
    """
    cfg = cfg.resolve()
    b, _, ts = inp.shape
    x = embed_tokens(params, cfg, inp)
    table = precompute_rope(cfg.max_seq_len + ts, cfg.head_dim, cfg.rope_base)
    freqs = lax.dynamic_slice(table, (start_pos, 0, 0),
                              (ts,) + table.shape[1:])

    i = jnp.arange(ts)
    j = jnp.arange(kv_len)
    # absolute causal mask: suffix query i sits at start_pos + i
    kv_mask = (j[None, :] <= (start_pos + i)[:, None])[None]  # (1, Ts, S)

    x, cache = _run_stack_decode(
        params["layers"], _slow_spec(cfg), x, freqs, cache, start_pos,
        kv_mask, kv_len=kv_len,
    )
    return _prefill_tail(params, cfg, x, t_end, cache)


def decode_slow_step(params, cfg: DualARConfig, token, cache, pos,
                     kv_valid=None, kv_len=None):
    """One slow-transformer step.

    Args:
      token: (B, C+1) int32 current token column.
      cache: slow KV cache.
      pos: scalar int32 absolute position to write.
      kv_valid: optional (B,) int32 per-row start offsets — for batched
        lockstep decode with mixed prompt lengths (left-aligned prompts):
        slots before a row's offset are pad and masked out.

    Returns (hidden (B, D) for the fast stack, slow_out (B, D) normed, cache).
    """
    cfg = cfg.resolve()
    x = embed_tokens(params, cfg, token[:, :, None])  # (B, 1, D)

    table = precompute_rope(cfg.max_seq_len, cfg.head_dim, cfg.rope_base)
    freqs = lax.dynamic_slice(table, (pos, 0, 0), (1,) + table.shape[1:])

    s = cache["k"].shape[2]
    j = jnp.arange(s)
    kv_mask = (j <= pos)[None, None, :]  # (B=1, T=1, S)
    if kv_valid is not None:
        kv_mask = kv_mask & (j[None, :] >= kv_valid[:, None])[:, None, :]

    x, cache = _run_stack_decode(
        params["layers"], _slow_spec(cfg), x, freqs, cache, pos, kv_mask,
        kv_len=kv_len,
    )
    x = x[:, 0]
    slow_out = rms_norm(x, params["norm"], cfg.norm_eps)
    hidden = slow_out if cfg.norm_fastlayer_input else x
    return hidden, slow_out, cache


def _rope_rows(x, fr):
    """Rotate x (B, 1, H, D) by per-row freqs fr (B, 1, d/2, 2)."""
    b, s, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, h, d // 2, 2)
    frf = fr.astype(jnp.float32)[:, :, None, :, :]  # (B,1,1,d/2,2)
    real = xf[..., 0] * frf[..., 0] - xf[..., 1] * frf[..., 1]
    imag = xf[..., 1] * frf[..., 0] + xf[..., 0] * frf[..., 1]
    return jnp.stack([real, imag], axis=-1).reshape(b, s, h, d).astype(x.dtype)


def decode_slow_step_multi(params, cfg: DualARConfig, token, cache, pos,
                           active, kv_len=None):
    """One slow step with independent per-row positions.

    Each row is its own sequence: row b's prompt+generation occupy cache
    slots [0, pos[b]]; the mask is j <= pos[b].

    Returns (hidden, slow_out, cache).
    """
    cfg = cfg.resolve()
    x = embed_tokens(params, cfg, token[:, :, None])  # (B, 1, D)

    table = precompute_rope(cfg.max_seq_len, cfg.head_dim, cfg.rope_base)
    freqs = jnp.take(table, jnp.clip(pos, 0, table.shape[0] - 1), axis=0)

    s = cache["k"].shape[2]
    j = jnp.arange(s)
    kv_mask = (j[None, :] <= pos[:, None])[:, None, :]  # (B, 1, S)

    spec = _slow_spec(cfg)
    rows = jnp.arange(token.shape[0])
    x, cache = _run_stack_decode(
        params["layers"], spec, x, freqs[:, None], cache, None, kv_mask,
        kv_len=kv_len, write_rows=(rows, pos, active),
    )
    x = x[:, 0]
    slow_out = rms_norm(x, params["norm"], cfg.norm_eps)
    hidden = slow_out if cfg.norm_fastlayer_input else x
    return hidden, slow_out, cache


def insert_cache_slot(pool, single, slot):
    """Copy a single-sequence cache (L, 1, S, H, D) into pool slot `slot`."""
    return {
        "k": lax.dynamic_update_slice(
            pool["k"], single["k"].astype(pool["k"].dtype), (0, slot, 0, 0, 0)
        ),
        "v": lax.dynamic_update_slice(
            pool["v"], single["v"].astype(pool["v"].dtype), (0, slot, 0, 0, 0)
        ),
    }


def insert_cache_rows(pool, group, rows):
    """Scatter a k-row group cache (L, k, S', H, D) into pool rows `rows`
    ((k,) int32). S' may be smaller than the pool's seq axis (the group
    prefill only fills its prompt bucket; later positions are written by
    decode before they are ever attended)."""
    s = group["k"].shape[2]
    return {
        "k": pool["k"].at[:, rows, :s].set(group["k"].astype(pool["k"].dtype)),
        "v": pool["v"].at[:, rows, :s].set(group["v"].astype(pool["v"].dtype)),
    }


def precompute_semantic_head(params, cfg: DualARConfig):
    """Materialize the restricted-head weight slice once.

    `semantic_head_logits` slices semantic∪im_end columns out of the full
    head every call; inside the decode scan that loop-invariant slice is
    NOT hoisted by XLA and costs a ~10 MB copy per frame (measured 27 us
    on v5e). Returns a params dict augmented with `_semantic_head`, which
    `semantic_head_logits` uses directly. Inference sessions call this at
    init; checkpoints/training never see the extra key.
    """
    cfg = cfg.resolve()
    sb, se = cfg.semantic_begin_id, cfg.semantic_end_id
    if cfg.tie_word_embeddings:
        w_sem = params["embeddings"][sb : se + 1].T
        w_end = params["embeddings"][cfg.im_end_id][:, None]
        head = {"w": jnp.concatenate([w_sem, w_end], axis=1)}
    else:
        out_w = params["output"]
        if isinstance(out_w, dict) and "q" in out_w:
            head = {
                "q": jnp.concatenate(
                    [out_w["q"][:, sb : se + 1],
                     out_w["q"][:, cfg.im_end_id][:, None]], axis=1
                ),
                "s": jnp.concatenate(
                    [out_w["s"][sb : se + 1], out_w["s"][cfg.im_end_id][None]],
                    axis=0,
                ),
            }
        else:
            head = {
                "w": jnp.concatenate(
                    [out_w[:, sb : se + 1], out_w[:, cfg.im_end_id][:, None]],
                    axis=1,
                )
            }
    new = dict(params)
    new["_semantic_head"] = head
    return new


def fuse_ffn_weights(params):
    """Inference-only FFN fusion: concatenate each stack's w1|w3 into w13.

    `_ffn` then issues one (D, 2I) matmul per layer instead of two (D, I)
    halves — same bytes from HBM, one DMA stream, fewer op boundaries in
    the decode scan (measured ~0.3 ms/frame on the flagship at batch 1).
    Works on plain, int8 ({"q","s"}) and int4 ({"p","gs"}) weights: all
    store the output dim last, so per-output-column math is unchanged and
    the fused path is numerically identical to the split one.

    Checkpoints and the trainer always keep w1/w3 split (the reference's
    layout, `llama.py` FeedForward); sessions fuse at load. LoRA deltas
    stay per-projection (`lora["w1"]`/`lora["w3"]`) and are added to the
    split halves of the fused product.

    Do NOT call this on multi-device-sharded params: w1 and w3 are each
    column-sharded over tp, and their naive concat interleaves shards
    wrong (device 0 would hold all of w1, device 1 all of w3).
    """
    def fuse_stack(layers):
        if "w1" not in layers:
            return layers
        w1, w3 = layers["w1"], layers["w3"]
        if isinstance(w1, dict) and "q" in w1:
            w13 = {
                "q": jnp.concatenate([w1["q"], w3["q"]], axis=-1),
                "s": jnp.concatenate([w1["s"], w3["s"]], axis=-1),
            }
        elif isinstance(w1, dict) and "p" in w1:
            w13 = {
                "p": jnp.concatenate([w1["p"], w3["p"]], axis=-1),
                "gs": jnp.concatenate([w1["gs"], w3["gs"]], axis=-1),
            }
        else:
            w13 = jnp.concatenate([w1, w3], axis=-1)
        out = {k: v for k, v in layers.items() if k not in ("w1", "w3")}
        out["w13"] = w13
        return out

    new = dict(params)
    new["layers"] = fuse_stack(params["layers"])
    if "fast" in params:
        fast = dict(params["fast"])
        fast["layers"] = fuse_stack(fast["layers"])
        new["fast"] = fast
    return new


def is_multidevice(params) -> bool:
    """True if any leaf is sharded across more than one device."""
    for x in jax.tree_util.tree_leaves(params):
        s = getattr(x, "sharding", None)
        if s is not None and len(getattr(s, "device_set", ())) > 1:
            return True
    return False


def semantic_head_logits(params, cfg: DualARConfig, slow_out):
    """Constrained-decoding LM head: logits over the semantic id range plus
    `<|im_end|>` only — columns [0, S) map to semantic ids, column S is
    im_end. Numerically identical to full-vocab logits + the reference's
    -inf bias (`inference.py:308-320`) but skips the (potentially 150k-wide)
    full head matmul.
    """
    cfg = cfg.resolve()
    sb, se = cfg.semantic_begin_id, cfg.semantic_end_id
    pre = params.get("_semantic_head")
    if pre is not None:
        if "q" in pre:
            logits = (slow_out @ pre["q"].astype(slow_out.dtype)) * pre[
                "s"
            ].astype(slow_out.dtype)
        else:
            logits = slow_out @ pre["w"]
        return _semantic_head_lora(params, cfg, slow_out, logits)
    if cfg.tie_word_embeddings:
        w_sem = params["embeddings"][sb : se + 1].T  # (D, S)
        w_end = params["embeddings"][cfg.im_end_id][:, None]  # (D, 1)
        logits = slow_out @ jnp.concatenate([w_sem, w_end], axis=1)
    else:
        out_w = params["output"]
        if isinstance(out_w, dict) and "q" in out_w:  # int8-quantized head
            q = jnp.concatenate(
                [out_w["q"][:, sb : se + 1], out_w["q"][:, cfg.im_end_id][:, None]],
                axis=1,
            )
            s = jnp.concatenate(
                [out_w["s"][sb : se + 1], out_w["s"][cfg.im_end_id][None]], axis=0
            )
            logits = (slow_out @ q.astype(slow_out.dtype)) * s.astype(slow_out.dtype)
        else:
            w_sem = out_w[:, sb : se + 1]
            w_end = out_w[:, cfg.im_end_id][:, None]
            logits = slow_out @ jnp.concatenate([w_sem, w_end], axis=1)
    return _semantic_head_lora(params, cfg, slow_out, logits)


def _semantic_head_lora(params, cfg: DualARConfig, slow_out, logits):
    sb, se = cfg.semantic_begin_id, cfg.semantic_end_id
    la = params.get("lora_embeddings" if cfg.tie_word_embeddings else "lora_output")
    if la is not None:
        if cfg.tie_word_embeddings:
            # effective rows = (W + s*A@B)[rows]; delta = (x @ B.T) @ A[rows].T
            a_rows = jnp.concatenate(
                [la["a"][sb : se + 1], la["a"][cfg.im_end_id][None]], axis=0
            )
            logits = logits + cfg.lora_scale * ((slow_out @ la["b"].T) @ a_rows.T)
        else:
            b_cols = jnp.concatenate(
                [la["b"][:, sb : se + 1], la["b"][:, cfg.im_end_id][:, None]], axis=1
            )
            logits = logits + cfg.lora_scale * ((slow_out @ la["a"]) @ b_cols)
    return logits.astype(jnp.float32)  # (B, S+1)


def semantic_index_to_token(cfg: DualARConfig, idx):
    """Map a restricted-head sample index back to a text-vocab id."""
    n_sem = cfg.semantic_end_id - cfg.semantic_begin_id + 1
    return jnp.where(idx >= n_sem, cfg.im_end_id, cfg.semantic_begin_id + idx)


def fast_decode_step(params, cfg: DualARConfig, x, fast_cache, pos,
                     with_logits: bool = True):
    """One fast-transformer step over the codebook axis.

    Args:
      x: (B, Df) input embedding (projected hidden at pos 0, else codebook
        embedding).
      fast_cache: fast KV cache (seq len = num_codebooks).
      pos: scalar int32 codebook position.
      with_logits: the pos-0 call only fills the cache (its sample comes
        from the slow head), so callers pass False there to skip the dead
        head matmul.

    Returns (logits (B, K) fp32 or None, fast_cache).
    """
    cfg = cfg.resolve()
    table = precompute_rope(cfg.num_codebooks, cfg.fast_head_dim, cfg.rope_base)
    freqs = lax.dynamic_slice(table, (pos, 0, 0), (1,) + table.shape[1:])
    kv_mask = (jnp.arange(cfg.num_codebooks) <= pos)[None, :]

    y, fast_cache = _run_stack_decode(
        params["fast"]["layers"], _fast_spec(cfg), x[:, None], freqs,
        fast_cache, pos, kv_mask,
    )
    if not with_logits:
        return None, fast_cache
    out = rms_norm(y[:, 0], params["fast"]["norm"], cfg.norm_eps)
    return _fast_head(params, cfg, out), fast_cache
