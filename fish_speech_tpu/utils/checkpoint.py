"""Native checkpoint format: a directory with

  config.json          DualARConfig (reference-compatible keys)
  model.safetensors    flat "/"-joined param pytree (bf16/fp32 tensors)
  tokenizer.json       tokenizers-format vocab

  codec_config.json    DACConfig (when a codec is bundled)
  codec.safetensors    codec params

Lists inside pytrees (e.g. RVQ codebook stacks) are encoded as numeric path
segments. The torch->native converters in `fish_speech_tpu.convert` write
this format; training checkpoints (with optimizer state) use orbax on top.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from safetensors.numpy import load_file as st_load
from safetensors.numpy import save_file as st_save

from fish_speech_tpu.config import (
    CodecTransformerConfig,
    DACConfig,
    DualARConfig,
    RVQConfig,
)

# -- pytree <-> flat dict --


def flatten_pytree(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_pytree(v, f"{prefix}{i}/"))
    else:
        key = prefix[:-1]
        arr = np.asarray(tree)
        if arr.dtype == jnp.bfloat16:
            # safetensors-numpy can't serialize ml_dtypes bf16; store raw bits
            out[key + "::bf16"] = arr.view(np.uint16)
        else:
            out[key] = arr
    return out


def unflatten_pytree(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        if key.endswith("::bf16"):
            key = key[: -len("::bf16")]
            value = value.view(jnp.bfloat16)
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return _lists_from_numeric_dicts(root)


def _lists_from_numeric_dicts(node):
    if not isinstance(node, dict):
        return node
    node = {k: _lists_from_numeric_dicts(v) for k, v in node.items()}
    if node and all(k.isdigit() for k in node):
        return [node[str(i)] for i in range(len(node))]
    return node


# -- save/load --


def save_params(path, params, name="model.safetensors"):
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    flat = flatten_pytree(jax.device_get(params))
    st_save(flat, str(path / name))


def load_params(path, name="model.safetensors", dtype=None):
    flat = st_load(str(Path(path) / name))
    tree = unflatten_pytree(flat)
    if dtype is not None:
        tree = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
            or np.asarray(x).dtype == jnp.bfloat16
            else jnp.asarray(x),
            tree,
        )
    return tree


def save_dual_ar(path, params, cfg: DualARConfig, tokenizer=None):
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    cfg.to_json(str(path / "config.json"))
    save_params(path, params)
    if tokenizer is not None:
        tokenizer.save_pretrained(str(path))


def load_dual_ar(path, dtype=jnp.bfloat16):
    path = Path(path)
    cfg = DualARConfig.from_json(str(path / "config.json"))
    params = load_params(path, dtype=dtype)
    return params, cfg


def _dac_config_to_json(cfg: DACConfig) -> dict:
    d = dataclasses.asdict(cfg)
    return d


def _dac_config_from_json(d: dict) -> DACConfig:
    rvq = d.pop("rvq")
    for k in ("pre_transformer", "post_transformer"):
        if rvq.get(k) is not None:
            rvq[k] = CodecTransformerConfig(**rvq[k])
    rvq["downsample_factor"] = tuple(rvq["downsample_factor"])
    d["encoder_rates"] = tuple(d["encoder_rates"])
    d["decoder_rates"] = tuple(d["decoder_rates"])
    d["encoder_transformer_layers"] = tuple(d["encoder_transformer_layers"])
    return DACConfig(rvq=RVQConfig(**rvq), **d)


def save_dac(path, params, cfg: DACConfig):
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "codec_config.json", "w") as f:
        json.dump(_dac_config_to_json(cfg), f, indent=2)
    save_params(path, params, name="codec.safetensors")


def load_dac(path, dtype=jnp.float32):
    path = Path(path)
    with open(path / "codec_config.json") as f:
        cfg = _dac_config_from_json(json.load(f))
    params = load_params(path, name="codec.safetensors", dtype=dtype)
    return params, cfg
