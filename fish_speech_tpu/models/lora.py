"""LoRA fine-tuning for the Dual-AR model (functional).

Reference semantics: `fish_speech/models/text2semantic/lora.py` (loralib) —
target modules "attention" (wqkv+wo), "mlp" (w1/w2/w3), "embeddings"
(text + codebook + fast embeddings), "output" (lm head + fast head);
unprefixed names also target the fast stack, `fast_*` names target only it.
A initialized gaussian, B zeros, runtime delta = (alpha/r) * x@A@B.

Functional design: LoRA leaves live INSIDE the param pytree
(layer dicts get a "lora" sub-dict keyed by weight name; top-level tables
get "lora_embeddings"/"lora_output" siblings). The forward code picks them
up when `cfg.lora_scale != 0`. `lora_filter` marks exactly these leaves
trainable; `merge_lora` folds them back into plain weights.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import DualARConfig


@dataclass
class LoraConfig:
    r: int
    lora_alpha: float
    lora_dropout: float = 0.0
    target_modules: List[str] = field(
        default_factory=lambda: ["attention", "mlp", "embeddings", "output"]
    )

    @property
    def scale(self) -> float:
        return self.lora_alpha / self.r


def apply_lora_config(cfg: DualARConfig, lora_cfg: LoraConfig) -> DualARConfig:
    """Return a config with the (static) LoRA runtime scale set."""
    return dataclasses.replace(cfg, lora_scale=lora_cfg.scale)


def _init_ab(key, d_in, d_out, r, dtype):
    ka, _ = jax.random.split(key)
    a = (jax.random.normal(ka, (d_in, r), jnp.float32) * 0.01).astype(dtype)
    b = jnp.zeros((r, d_out), dtype)
    return {"a": a, "b": b}


def _init_stacked_ab(key, n_layer, d_in, d_out, r, dtype):
    ka, _ = jax.random.split(key)
    a = (jax.random.normal(ka, (n_layer, d_in, r), jnp.float32) * 0.01).astype(dtype)
    b = jnp.zeros((n_layer, r, d_out), dtype)
    return {"a": a, "b": b}


def add_lora(params, cfg: DualARConfig, lora_cfg: LoraConfig, key,
             dtype=jnp.bfloat16):
    """Return params with LoRA leaves added (base weights untouched)."""
    cfg = cfg.resolve()
    t = set(lora_cfg.target_modules)
    slow_attn = "attention" in t
    slow_mlp = "mlp" in t
    slow_emb = "embeddings" in t
    slow_out = "output" in t
    fast_attn = slow_attn or "fast_attention" in t
    fast_mlp = slow_mlp or "fast_mlp" in t
    fast_emb = slow_emb or "fast_embeddings" in t
    fast_out = slow_out or "fast_output" in t
    r = lora_cfg.r

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    keys = iter(jax.random.split(key, 16))

    def layer_lora(layers, n_layer, dim, n_head, n_kv, head_dim, inter,
                   attn, mlp):
        lora = {}
        if attn:
            total = (n_head + 2 * n_kv) * head_dim
            lora["wqkv"] = _init_stacked_ab(next(keys), n_layer, dim, total, r, dtype)
            lora["wo"] = _init_stacked_ab(
                next(keys), n_layer, n_head * head_dim, dim, r, dtype
            )
        if mlp:
            lora["w1"] = _init_stacked_ab(next(keys), n_layer, dim, inter, r, dtype)
            lora["w3"] = _init_stacked_ab(next(keys), n_layer, dim, inter, r, dtype)
            lora["w2"] = _init_stacked_ab(next(keys), n_layer, inter, dim, r, dtype)
        if lora:
            layers = dict(layers)
            layers["lora"] = lora
        return layers

    params["layers"] = layer_lora(
        params["layers"], cfg.n_layer, cfg.dim, cfg.n_head, cfg.n_local_heads,
        cfg.head_dim, cfg.intermediate_size, slow_attn, slow_mlp,
    )
    fast = dict(params["fast"])
    fast["layers"] = layer_lora(
        fast["layers"], cfg.n_fast_layer, cfg.fast_dim, cfg.fast_n_head,
        cfg.fast_n_local_heads, cfg.fast_head_dim, cfg.fast_intermediate_size,
        fast_attn, fast_mlp,
    )
    if fast_emb:
        fast["lora_embeddings"] = _init_ab(
            next(keys), cfg.codebook_size, cfg.fast_dim, r, dtype
        )
    if fast_out:
        fast["lora_output"] = _init_ab(
            next(keys), cfg.fast_dim, cfg.codebook_size, r, dtype
        )
    params["fast"] = fast

    if slow_emb:
        params["lora_embeddings"] = _init_ab(
            next(keys), cfg.vocab_size, cfg.dim, r, dtype
        )
        params["lora_codebook_embeddings"] = _init_ab(
            next(keys), cfg.codebook_size * cfg.num_codebooks, cfg.dim, r, dtype
        )
    if slow_out and not cfg.tie_word_embeddings:
        params["lora_output"] = _init_ab(
            next(keys), cfg.dim, cfg.vocab_size, r, dtype
        )
    return params


def _is_lora_path(path) -> bool:
    return any("lora" in str(getattr(p, "key", p)) for p in path)


def lora_filter(params):
    """Bool pytree: True exactly on LoRA leaves (for trainable masking)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _is_lora_path(path), params
    )


def extract_lora(params):
    """Keep only LoRA leaves (for LoRA-only checkpoints,
    `lit_module.py:32-41`)."""

    def walk(node, path=""):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                sub = walk(v, path + k + "/")
                if sub is not None:
                    out[k] = sub
            return out or None
        return node if "lora" in path else None

    return walk(params) or {}


def merge_lora(params, cfg: DualARConfig):
    """Fold LoRA deltas into the base weights and drop the LoRA leaves.
    Mirrors `tools/llama/merge_lora.py` semantics."""
    cfg = cfg.resolve()
    scale = cfg.lora_scale
    assert scale != 0.0, "merge_lora called without an active lora_scale"

    def merge_ab(w, ab):
        delta = jnp.einsum(
            "...ir,...ro->...io", ab["a"].astype(jnp.float32),
            ab["b"].astype(jnp.float32),
        )
        return (w.astype(jnp.float32) + scale * delta).astype(w.dtype)

    out = dict(params)

    def merge_layers(layers):
        layers = dict(layers)
        lora = layers.pop("lora", None)
        if lora:
            for name, ab in lora.items():
                layers[name] = merge_ab(layers[name], ab)
        return layers

    out["layers"] = merge_layers(params["layers"])
    fast = dict(params["fast"])
    fast["layers"] = merge_layers(fast["layers"])
    if "lora_embeddings" in fast:
        fast["embeddings"] = merge_ab(fast["embeddings"], fast.pop("lora_embeddings"))
    if "lora_output" in fast:
        fast["output"] = merge_ab(fast["output"], fast.pop("lora_output"))
    out["fast"] = fast
    if "lora_embeddings" in out:
        out["embeddings"] = merge_ab(out["embeddings"], out.pop("lora_embeddings"))
    if "lora_codebook_embeddings" in out:
        out["codebook_embeddings"] = merge_ab(
            out["codebook_embeddings"], out.pop("lora_codebook_embeddings")
        )
    if "lora_output" in out:
        out["output"] = merge_ab(out["output"], out.pop("lora_output"))
    return out
