"""Weight-only quantization (int8 per-channel, gpt-fast style).

Replaces the reference's CUDA int8/int4 PTQ (`tools/llama/quantize.py`) with
a TPU-native scheme: weights stored int8 with a per-output-channel bf16
scale; the int8->bf16 convert fuses into the XLA dot so HBM traffic halves.

A quantized weight is a dict {"q": int8 (..., I, O), "s": (..., O)} and the
model's matmul helper dispatches on it transparently (works under the
stacked-layer lax.scan too).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_int8(w, axis=-2):
    """Symmetric per-output-channel int8 quantization of (..., I, O)."""
    wf = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(wf / jnp.maximum(scale, 1e-12)), -128, 127).astype(
        jnp.int8
    )
    # fp32 scales: negligible storage, avoids a ~0.4% multiplicative bf16
    # rounding on every channel
    return {"q": q, "s": jnp.squeeze(scale, axis=axis)}


def dequantize_int8(qw, dtype=jnp.bfloat16):
    return (qw["q"].astype(jnp.float32) * qw["s"][..., None, :].astype(jnp.float32)).astype(dtype)


def quantize_int4(w, group_size: int = 128):
    """Group-wise symmetric int4 quantization of (..., I, O).

    Values are packed two-per-byte along the input dim using a HALF-SPLIT
    layout: byte[i, o] holds w[i, o] in the low nibble and w[i + I/2, o] in
    the high nibble — so unpacking yields two contiguous row blocks (no
    interleave, TPU-lane friendly).

    Returns {"p": uint8 (..., I/2, O), "gs": (..., I/group_size, O) f32,
             "g": group_size (python int, stored via aux key)}.
    """
    wf = jnp.asarray(w, jnp.float32)
    *lead, i, o = wf.shape
    assert i % 2 == 0 and i % group_size == 0, (i, group_size)
    grouped = wf.reshape(*lead, i // group_size, group_size, o)
    absmax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)
    scale = absmax / 7.0
    q = jnp.clip(
        jnp.round(grouped / jnp.maximum(scale, 1e-12)), -8, 7
    ).astype(jnp.int8)
    q = q.reshape(*lead, i, o)
    half = i // 2
    lo = q[..., :half, :]
    hi = q[..., half:, :]
    packed = ((lo + 8).astype(jnp.uint8) | ((hi + 8).astype(jnp.uint8) << 4))
    # group size is recoverable from shapes: g = (2 * p.rows) / gs.rows
    return {"p": packed, "gs": jnp.squeeze(scale, axis=-2)}


def _int4_effective_weight(qw, dtype):
    """Unpack an int4-packed weight to (..., I, O) in `dtype`. XLA fuses this
    elementwise chain into the consuming dot's operand load on TPU, so the
    HBM read is the packed bytes."""
    p = qw["p"]
    lo = (p & 0xF).astype(jnp.int8) - 8
    hi = (p >> 4).astype(jnp.int8) - 8
    q = jnp.concatenate([lo, hi], axis=-2)  # (..., I, O)
    *lead, i, o = q.shape
    g = i // qw["gs"].shape[-2]
    scale = jnp.repeat(qw["gs"], g, axis=-2).astype(jnp.float32)
    return (q.astype(jnp.float32) * scale).astype(dtype)


def _use_pallas_int4() -> bool:
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False


def mm(x, w):
    """Matmul that accepts plain, int8-, or int4-quantized weights.

    int4 uses the Pallas fused unpack-dequant-matmul kernel on TPU (XLA
    declines to fuse the nibble unpack into the dot and materializes the
    weights, which is slower than bf16); elsewhere the jnp reference path.
    """
    if isinstance(w, dict) and "p" in w:
        if _use_pallas_int4():
            from fish_speech_tpu.ops.pallas_int4 import int4_matmul

            lead = x.shape[:-1]
            x2 = x.reshape(-1, x.shape[-1])
            y = int4_matmul(x2, w["p"], w["gs"])
            return y.reshape(*lead, y.shape[-1])
        return x @ _int4_effective_weight(w, x.dtype)
    if isinstance(w, dict) and "q" in w:
        y = x @ w["q"].astype(x.dtype)
        return y * w["s"].astype(x.dtype)
    return x @ w


DEFAULT_TARGETS = ("wqkv", "wo", "w1", "w2", "w3")


def _quantize_weight(w, mode: str, group_size: int):
    if mode == "int8":
        return quantize_int8(w)
    if mode == "int4":
        i = w.shape[-2]
        g = group_size
        # g must divide I and must not straddle the half split (kernel
        # contract): (I/2) % g == 0
        while g > 1 and (i % g or (i // 2) % g):
            g //= 2
        return quantize_int4(w, group_size=g)
    raise ValueError(mode)


def quantize_layer_stack(layers: dict, targets=DEFAULT_TARGETS, mode="int8",
                         group_size=128) -> dict:
    out = dict(layers)
    for name in targets:
        if name in out and not isinstance(out[name], dict):
            out[name] = _quantize_weight(out[name], mode, group_size)
    return out


def quantize_dual_ar_lowmem(params, targets=DEFAULT_TARGETS,
                            quantize_heads=True, mode="int8",
                            fast_mode=None, group_size: int = 128):
    """Memory-bounded quantization for device-resident flagship models:
    quantizes one weight leaf at a time (donating the source buffer) and
    maps over the stacked-layer axis so fp32 temporaries stay per-layer
    sized. Peak extra memory ~ one layer's fp32 copy instead of the whole
    tree's."""
    import functools as _ft

    def leaf_fn(w, m, g):
        if w.ndim == 3:  # stacked layers: process one layer at a time
            return jax.lax.map(lambda wi: _quantize_weight(wi, m, g), w)
        return _quantize_weight(w, m, g)

    jitted = {}

    def q(w, m, g):
        key = (m, g, w.shape, str(w.dtype))
        if key not in jitted:
            jitted[key] = jax.jit(
                _ft.partial(leaf_fn, m=m, g=g), donate_argnums=(0,)
            )
        out = jitted[key](w)
        jax.block_until_ready(out)
        return out

    out = dict(params)
    layers = dict(params["layers"])
    for name in targets:
        if name in layers and not isinstance(layers[name], dict):
            layers[name] = q(layers.pop(name), mode, group_size)
    out["layers"] = layers
    fast = dict(params["fast"])
    flayers = dict(fast["layers"])
    for name in targets:
        if name in flayers and not isinstance(flayers[name], dict):
            flayers[name] = q(flayers.pop(name), fast_mode or mode, group_size)
    fast["layers"] = flayers
    if quantize_heads and "output" in fast and not isinstance(fast["output"], dict):
        fast["output"] = q(fast.pop("output"), "int8", group_size)
    out["fast"] = fast
    if quantize_heads and "output" in out and not isinstance(out["output"], dict):
        out["output"] = q(out.pop("output"), "int8", group_size)
    return out


def quantize_dual_ar(params, targets=DEFAULT_TARGETS, quantize_heads=True,
                     mode: str = "int8", group_size: int = 128):
    """Quantize the Dual-AR param tree (returns a new tree).

    mode: "int8" (per-channel) or "int4" (group-wise, packed 2/byte).
    Embedding tables stay bf16 (gathers, not matmuls); the untied LM head and
    fast head are quantized when quantize_heads (always int8 — the head is
    quality-sensitive and a small share of traffic).
    """
    out = dict(params)
    out["layers"] = quantize_layer_stack(params["layers"], targets, mode, group_size)
    fast = dict(params["fast"])
    fast["layers"] = quantize_layer_stack(fast["layers"], targets, mode, group_size)
    if quantize_heads and "output" in fast and not isinstance(fast["output"], dict):
        fast["output"] = quantize_int8(fast["output"])
    out["fast"] = fast
    if quantize_heads and "output" in out and not isinstance(out["output"], dict):
        out["output"] = quantize_int8(out["output"])
    return out
