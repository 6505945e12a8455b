"""Mesh + sharding policy.

The scaling design (replacing the reference's Lightning-DDP/NCCL world,
`SURVEY.md` §2.12): one 2D device mesh with axes

  dp — data parallel (batch axis; gradient psum rides this axis)
  tp — tensor parallel (attention heads / FFN hidden / vocab)

Sharding is declarative: parameters and batches get `NamedSharding`
annotations and GSPMD inserts the collectives (all-gather/reduce-scatter on
ICI). The specs below are Megatron-style: qkv/w1/w3/vocab column-parallel,
wo/w2 row-parallel, norms replicated, KV cache sharded over heads.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fish_speech_tpu.config import DualARConfig


def init_distributed(
    coordinator: Optional[str] = None,
    num_hosts: Optional[int] = None,
    host_id: Optional[int] = None,
) -> bool:
    """Multi-host wiring: join the JAX distributed runtime.

    The reference reaches multi-node through Lightning DDP
    (`fish_speech/configs/base.yaml:18-21` + `num_nodes`); here the same
    capability is jax.distributed + GSPMD — after initialize, `jax.devices()`
    is the GLOBAL device set, `make_mesh` spans all hosts, and the
    NamedSharding specs place collectives on ICI/DCN automatically. Call
    BEFORE any other jax API touches the backend. Returns True when
    multi-host mode was activated (coordinator given).

    CPU backends use gloo collectives (also how the 2-process smoke test
    runs, `tests/test_multihost.py`).
    """
    if not coordinator:
        return False
    try:  # only affects CPU backends; harmless elsewhere
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # noqa: BLE001 - older jax without the option
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_hosts,
        process_id=host_id,
    )
    return True


def make_mesh(
    devices: Optional[Sequence] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
) -> Mesh:
    """Build a (dp, tp) mesh. Defaults: all devices on tp for inference-style
    sharding when neither is given."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = 1, n
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _layer_specs(qk_norm: bool, qkv_bias: bool, o_bias: bool):
    specs = {
        "attn_norm": P(None, None),
        "wqkv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "ffn_norm": P(None, None),
        "w1": P(None, None, "tp"),
        "w3": P(None, None, "tp"),
        "w2": P(None, "tp", None),
    }
    if qkv_bias:
        specs["bqkv"] = P(None, "tp")
    if o_bias:
        specs["bo"] = P(None, None)
    if qk_norm:
        specs["q_norm"] = P(None, None)
        specs["k_norm"] = P(None, None)
    return specs


def dual_ar_param_specs(cfg: DualARConfig):
    """PartitionSpec pytree matching `init_dual_ar`'s structure."""
    cfg = cfg.resolve()
    specs = {
        "embeddings": P("tp", None),  # vocab-sharded (big table)
        "codebook_embeddings": P(None, None),
        "layers": _layer_specs(
            cfg.attention_qk_norm, cfg.attention_qkv_bias, cfg.attention_o_bias
        ),
        "norm": P(None),
        "fast": {
            "embeddings": P(None, None),
            "layers": _layer_specs(
                cfg.fast_attention_qk_norm,
                cfg.fast_attention_qkv_bias,
                cfg.fast_attention_o_bias,
            ),
            "norm": P(None),
            "output": P(None, "tp"),
        },
    }
    if not cfg.tie_word_embeddings:
        specs["output"] = P(None, "tp")
    if cfg.fast_dim != cfg.dim:
        specs["fast"]["project_in"] = {"w": P(None, "tp"), "b": P("tp")}
    return specs


def kv_cache_specs(quant: bool = False):
    """Slow KV cache (L, B, S, Hkv, Dh): batch over dp, heads over tp.

    quant=True adds specs for the int8 cache's per-(position, head) scale
    leaves ("ks"/"vs", (L, B, S, Hkv) — `dual_ar.init_kv_cache`), which
    shard like k/v minus the head-dim axis."""
    specs = {
        "k": P(None, "dp", None, "tp", None),
        "v": P(None, "dp", None, "tp", None),
    }
    if quant:
        specs["ks"] = P(None, "dp", None, "tp")
        specs["vs"] = P(None, "dp", None, "tp")
    return specs


def batch_spec(accum: bool = False):
    """Training batch dict specs: shard the batch axis over dp.

    accum=True prepends an unsharded microbatch axis (gradient
    accumulation: the train step scans over it; each microbatch stays
    dp-sharded on its own batch axis)."""
    spec = {
        "inputs": P("dp", None, None),
        "labels": P("dp", None, None),
        "pad_mask": P("dp", None),
    }
    if accum:
        spec = {k: P(None, *s) for k, s in spec.items()}
    return spec


def sharding_axis_names(x) -> set:
    """Mesh axis names an array's sharding actually uses (flattening
    tuple-nested PartitionSpec entries). Empty set = fully replicated."""
    return {
        ax
        for part in (x.sharding.spec or ())
        if part
        for ax in (part if isinstance(part, tuple) else (part,))
    }


def zero1_shard_opt_state(optimizer, opt_state, param_specs, mesh: Mesh):
    """ZeRO-1: shard the optimizer's params-shaped state (AdamW m/v) over
    the `dp` axis.

    The reference's Lightning DDP replicates optimizer state on every rank;
    at flagship scale AdamW's f32 m/v is ~40 GB, so full-model finetuning
    needs either LoRA masking (single chip) or this: each m/v leaf gets
    'dp' inserted on its first axis that is (a) not already sharded by the
    param's Megatron spec and (b) divisible by the dp size — per-replica
    optimizer memory drops by ~the dp factor. GSPMD then compiles the
    update into reduce-scatter(grads) + sharded AdamW + all-gather(updates)
    on ICI, the standard ZeRO-1 schedule, with zero changes to the train
    step itself (the jitted step pins state shardings via out_shardings).

    `optax.tree_map_params` walks exactly the params-shaped subtrees of the
    state (skipping step counts and `optax.masked` MaskedNode leaves), with
    the param-spec tree broadcast alongside.
    """
    import optax

    dp = mesh.shape["dp"]

    def reshard(leaf, spec):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return leaf  # MaskedNode / scalar chain state
        if isinstance(spec, NamedSharding):
            spec = spec.spec
        axes = list(spec) if spec is not None else []
        axes += [None] * (leaf.ndim - len(axes))
        if dp > 1:
            for ax in range(leaf.ndim):
                if axes[ax] is None and leaf.shape[ax] % dp == 0 \
                        and leaf.shape[ax] >= dp:
                    axes[ax] = "dp"
                    break
        return jax.device_put(leaf, NamedSharding(mesh, P(*axes)))

    state = optax.tree_map_params(
        optimizer, reshard, opt_state, param_specs,
        is_leaf=lambda x: isinstance(x, optax.MaskedNode),
    )

    # non-params-shaped leaves (e.g. the AdamW step `count`) were initialised
    # eagerly and sit on device 0 with a SingleDeviceSharding; replicate them
    # onto the mesh so the whole state tree shares one device set (required
    # when the jitted step pins these shardings via out_shardings)
    def replicate_rest(leaf):
        if hasattr(leaf, "sharding") and not isinstance(
            leaf.sharding, NamedSharding
        ):
            return jax.device_put(
                leaf, NamedSharding(mesh, P(*([None] * leaf.ndim)))
            )
        return leaf

    return jax.tree_util.tree_map(replicate_rest, state)


def train_state_memory_plan(cfg: DualARConfig, dp: int = 1, tp: int = 1,
                            zero1: bool = False, param_dtype=None) -> dict:
    """Pure-arithmetic per-chip HBM plan for full fine-tuning on a
    (dp, tp) mesh — no allocation, shapes from `jax.eval_shape`.

    Accounts the persistent training state exactly as this repo builds it:
    params in `param_dtype` (bf16 default) sharded per
    `dual_ar_param_specs`; grads with the params' sharding (GSPMD gives
    gradients the parameter sharding) and dtype; AdamW m/v in the params'
    dtype (optax's default `mu_dtype=None`), sharded like params plus —
    under ZeRO-1 — the extra `dp` axis `zero1_shard_opt_state` inserts on
    the first unsharded divisible dimension. Activations/temporaries are
    NOT included (they scale with batch x seq and remat policy; XLA's
    `memory_analysis()` on the compiled step reports them — see
    `bench.py --train`).

    This is the feasibility arithmetic behind docs/en/finetune.md's
    chip-count table (e.g.: the 4.97B flagship needs ~8 bytes/param of
    train state = ~40 GB, so full FT cannot fit any dp-only layout on
    16 GB v5e chips — params+grads alone replicate to 20 GB — while a
    (dp=2, tp=4) mesh plans ~1.5 bytes/param/chip).
    """
    import jax.numpy as jnp

    from fish_speech_tpu.models.dual_ar import init_dual_ar

    cfg = cfg.resolve()
    param_dtype = param_dtype or jnp.bfloat16
    shapes = jax.eval_shape(
        lambda: init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=param_dtype)
    )
    specs = dual_ar_param_specs(cfg)
    s_leaves, s_def = jax.tree_util.tree_flatten(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    p_leaves, p_def = jax.tree_util.tree_flatten(shapes)
    assert len(s_leaves) == len(p_leaves), (
        f"spec/param structure mismatch: {s_def} vs {p_def}"
    )
    mesh_size = {"dp": dp, "tp": tp}

    def per_chip(leaf, spec, extra_dp=False):
        axes = list(spec) if spec is not None else []
        axes += [None] * (leaf.ndim - len(axes))
        denom = 1
        for ax in axes:
            for nm in (ax if isinstance(ax, tuple) else (ax,) if ax else ()):
                denom *= mesh_size[nm]
        if extra_dp and dp > 1:
            # mirror zero1_shard_opt_state: first unsharded divisible axis
            for i, ax in enumerate(axes):
                if ax is None and leaf.shape[i] % dp == 0 \
                        and leaf.shape[i] >= dp:
                    denom *= dp
                    break
        return leaf.size * leaf.dtype.itemsize / denom

    params_b = sum(per_chip(l, s) for l, s in zip(p_leaves, s_leaves))
    grads_b = params_b
    opt_b = 2 * sum(per_chip(l, s, extra_dp=zero1)
                    for l, s in zip(p_leaves, s_leaves))
    total_params = sum(l.size for l in p_leaves)
    gib = float(2**30)
    return {
        "params_gib": round(params_b / gib, 2),
        "grads_gib": round(grads_b / gib, 2),
        "opt_gib": round(opt_b / gib, 2),
        "total_gib": round((params_b + grads_b + opt_b) / gib, 2),
        "bytes_per_param_per_chip": round(
            (params_b + grads_b + opt_b) / total_params, 2),
        "n_params": int(total_params),
        "mesh": {"dp": dp, "tp": tp, "zero1": zero1},
    }


def shard_params(params, cfg: DualARConfig, mesh: Mesh):
    """Place a param pytree onto the mesh per `dual_ar_param_specs`."""
    specs = dual_ar_param_specs(cfg)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def host_shard(tree, spec_tree, mesh: Mesh):
    """Place host-consistent arrays onto a (possibly multi-HOST) mesh.

    `jax.device_put` only targets addressable devices; when the mesh spans
    processes (multi-host serving, `server/main.py --coordinator`), each
    process instead supplies the shards its local devices own via
    `jax.make_array_from_callback`. Precondition: every process holds the
    SAME full value for each leaf (same checkpoint loaded / same seeded
    init), which is exactly how multi-host serving and the 2-process CPU
    tests construct them. Works identically on a single-process mesh.

    Axes a leaf cannot honor (dimension not divisible by the mesh axis,
    e.g. a 1-KV-head tiny model on tp=2) degrade to replication for that
    dimension — always numerically valid, GSPMD just all-gathers less."""
    import numpy as np

    def put(x, spec):
        spec = spec if isinstance(spec, P) else spec.spec
        host = np.asarray(x)
        fixed = []
        for d, ax in enumerate(tuple(spec) + (None,) * (host.ndim - len(spec))):
            names = ax if isinstance(ax, tuple) else (ax,) if ax else ()
            size = 1
            for nm in names:
                size *= mesh.shape[nm]
            fixed.append(ax if size and host.shape[d] % size == 0 else None)
        s = NamedSharding(mesh, P(*fixed))
        return jax.make_array_from_callback(host.shape, s,
                                            lambda idx: host[idx])

    return jax.tree_util.tree_map(
        put, tree, spec_tree,
        is_leaf=lambda x: isinstance(x, P) or hasattr(x, "spec"),
    )


def to_named(mesh: Mesh, tree_of_specs):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        tree_of_specs,
        is_leaf=lambda x: isinstance(x, P),
    )
