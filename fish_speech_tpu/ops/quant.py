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


def mm(x, w):
    """Matmul that accepts plain or int8-quantized weights."""
    if isinstance(w, dict) and "q" in w:
        y = x @ w["q"].astype(x.dtype)
        return y * w["s"].astype(x.dtype)
    return x @ w


DEFAULT_TARGETS = ("wqkv", "wo", "w1", "w2", "w3")


def quantize_layer_stack(layers: dict, targets=DEFAULT_TARGETS) -> dict:
    out = dict(layers)
    for name in targets:
        if name in out and not isinstance(out[name], dict):
            out[name] = quantize_int8(out[name])
    return out


def quantize_dual_ar(params, targets=DEFAULT_TARGETS, quantize_heads=True):
    """Quantize the Dual-AR param tree in place (returns a new tree).

    Embedding tables stay bf16 (gathers, not matmuls); the untied LM head and
    fast head are quantized when quantize_heads.
    """
    out = dict(params)
    out["layers"] = quantize_layer_stack(params["layers"], targets)
    fast = dict(params["fast"])
    fast["layers"] = quantize_layer_stack(fast["layers"], targets)
    if quantize_heads and "output" in fast and not isinstance(fast["output"], dict):
        fast["output"] = quantize_int8(fast["output"])
    out["fast"] = fast
    if quantize_heads and "output" in out and not isinstance(out["output"], dict):
        out["output"] = quantize_int8(out["output"])
    return out
