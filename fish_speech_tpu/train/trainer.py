"""Training driver: config -> data -> sharded train loop -> checkpoints.

Replaces the reference's Lightning/Hydra stack (`fish_speech/train.py`,
`lit_module.py`, `configs/*.yaml`) with one typed config and a jitted,
mesh-sharded step. DDP == the `dp` mesh axis; checkpoints via orbax with
auto-resume from the newest step (reference `train.py:92-99`).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fish_speech_tpu.config import DualARConfig
from fish_speech_tpu.models import dual_ar
from fish_speech_tpu.models.lora import (
    LoraConfig,
    add_lora,
    apply_lora_config,
    extract_lora,
    lora_filter,
)
from fish_speech_tpu.train.step import (
    constant_schedule_with_warmup,
    cosine_schedule_with_warmup,
    make_optimizer,
    make_train_step,
)

logger = logging.getLogger(__name__)


@dataclass
class TrainConfig:
    """Mirrors the reference finetune defaults
    (`configs/text2semantic_finetune.yaml`, `configs/base.yaml`)."""

    project: str = "text2semantic_finetune"
    output_dir: str = "results"
    max_steps: int = 10000
    batch_size: int = 4
    # microbatches accumulated per optimizer step (Lightning's
    # accumulate_grad_batches, ref configs/text2semantic_finetune.yaml)
    grad_accum_steps: int = 1
    max_length: int = 4096
    lr: float = 1e-4
    weight_decay: float = 0.01
    betas: tuple = (0.9, 0.95)
    grad_clip: float = 1.0
    warmup_steps: int = 100
    schedule: str = "cosine"  # "cosine" | "constant"
    final_lr_ratio: float = 0.1
    val_every_steps: int = 100
    val_batches: int = 4
    ckpt_every_steps: int = 1000
    keep_ckpts: int = 5
    log_every_steps: int = 10
    seed: int = 42
    precision: str = "bfloat16"
    # mesh
    dp: Optional[int] = None
    tp: int = 1
    # lora
    lora: Optional[LoraConfig] = None
    # ZeRO-1: shard AdamW m/v over the dp axis (parallel.mesh.
    # zero1_shard_opt_state) — per-replica optimizer memory drops by ~dp;
    # the compiled schedule becomes reduce-scatter(grads) + sharded update
    # + all-gather(updates), numerically identical to the replicated step
    zero1: bool = False


class Trainer:
    def __init__(
        self,
        cfg: DualARConfig,
        train_cfg: TrainConfig,
        params=None,
        mesh=None,
    ):
        self.train_cfg = train_cfg
        self.out_dir = Path(train_cfg.output_dir) / train_cfg.project
        self.out_dir.mkdir(parents=True, exist_ok=True)

        dtype = jnp.bfloat16 if train_cfg.precision == "bfloat16" else jnp.float32
        if params is None:
            params = dual_ar.init_dual_ar(
                jax.random.PRNGKey(train_cfg.seed), cfg, dtype=dtype
            )

        trainable = None
        if train_cfg.lora is not None:
            params = add_lora(
                params, cfg, train_cfg.lora,
                jax.random.PRNGKey(train_cfg.seed + 1), dtype=dtype,
            )
            cfg = apply_lora_config(cfg, train_cfg.lora)
            trainable = lora_filter(params)
        self.cfg = cfg.resolve()
        self.lora_mode = train_cfg.lora is not None

        if train_cfg.schedule == "cosine":
            schedule = cosine_schedule_with_warmup(
                train_cfg.lr, train_cfg.warmup_steps, train_cfg.max_steps,
                final_lr_ratio=train_cfg.final_lr_ratio,
            )
        else:
            schedule = constant_schedule_with_warmup(
                train_cfg.lr, train_cfg.warmup_steps, train_cfg.max_steps
            )
        self.optimizer = make_optimizer(
            lr=schedule,
            weight_decay=train_cfg.weight_decay,
            betas=train_cfg.betas,
            grad_clip=train_cfg.grad_clip,
            params=params,
            # LoRA: AdamW m/v only for trainable leaves (full f32 state for
            # the flagship is ~40 GB — does not fit a single chip)
            trainable_mask=trainable,
        )

        # mesh sharding (dp x tp); single-device works through the same path
        if mesh is None:
            from fish_speech_tpu.parallel.mesh import make_mesh

            n = len(jax.devices())
            tp = train_cfg.tp
            dp = train_cfg.dp or max(n // tp, 1)
            mesh = make_mesh(jax.devices()[: dp * tp], dp=dp, tp=tp)
        self.mesh = mesh

        from fish_speech_tpu.parallel.mesh import (
            batch_spec,
            dual_ar_param_specs,
            to_named,
        )

        pspecs = to_named(mesh, dual_ar_param_specs(self.cfg))
        # LoRA leaves and any extra keys: replicate
        pspecs = _match_tree(pspecs, params)
        self.params = jax.tree_util.tree_map(jax.device_put, params, pspecs)
        self.opt_state = self.optimizer.init(self.params)
        out_shardings = None
        if train_cfg.zero1:
            from fish_speech_tpu.parallel.mesh import zero1_shard_opt_state

            self.opt_state = zero1_shard_opt_state(
                self.optimizer, self.opt_state, pspecs, mesh
            )
            # pin the step's output shardings so the dp-sharded optimizer
            # state STAYS dp-sharded across steps (donation keeps the
            # buffers aliased); metrics stay unconstrained
            out_shardings = (
                jax.tree_util.tree_map(lambda x: x.sharding, self.params),
                jax.tree_util.tree_map(lambda x: x.sharding, self.opt_state),
                None,
            )
        self.bspecs = to_named(mesh, batch_spec())
        self.accum = max(train_cfg.grad_accum_steps, 1)
        self.bspecs_accum = to_named(mesh, batch_spec(accum=True))

        self.train_step = jax.jit(
            make_train_step(self.cfg, self.optimizer, trainable_filter=trainable,
                            grad_accum=self.accum),
            donate_argnums=(0, 1),
            out_shardings=out_shardings,
        )
        self.step = 0

    # -- checkpointing --

    def save_checkpoint(self):
        import orbax.checkpoint as ocp

        path = (self.out_dir / "checkpoints" / f"step_{self.step:08d}").absolute()
        ckptr = ocp.StandardCheckpointer()
        payload = {
            "params": extract_lora(self.params) if self.lora_mode else self.params,
            "opt_state": self.opt_state,
        }
        ckptr.save(path, payload)
        ckptr.wait_until_finished()
        with open(path / "meta.json", "w") as f:
            json.dump({"step": self.step}, f)
        self._prune_checkpoints()
        logger.info("Saved checkpoint at step %d -> %s", self.step, path)

    def _prune_checkpoints(self):
        ckpt_dir = self.out_dir / "checkpoints"
        ckpts = sorted(ckpt_dir.glob("step_*"))
        for old in ckpts[: -self.train_cfg.keep_ckpts]:
            import shutil

            shutil.rmtree(old)

    def latest_checkpoint(self) -> Optional[Path]:
        ckpt_dir = self.out_dir / "checkpoints"
        if not ckpt_dir.is_dir():
            return None
        ckpts = sorted(ckpt_dir.glob("step_*"), key=lambda p: p.stat().st_mtime)
        return ckpts[-1] if ckpts else None

    def restore_checkpoint(self, path=None) -> bool:
        import orbax.checkpoint as ocp

        path = Path(path) if path else self.latest_checkpoint()
        if path is None:
            return False
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": extract_lora(self.params) if self.lora_mode else self.params,
            "opt_state": self.opt_state,
        }
        restored = ckptr.restore(path.absolute(), target)
        if self.lora_mode:
            self.params = _merge_subtree(self.params, restored["params"])
        else:
            self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        with open(path / "meta.json") as f:
            self.step = json.load(f)["step"]
        logger.info("Resumed from %s (step %d)", path, self.step)
        return True

    # -- loop --

    def fit(self, train_loader, val_loader=None, resume: bool = True):
        if resume:
            self.restore_checkpoint()
        tcfg = self.train_cfg
        t0 = time.perf_counter()
        window_metrics = []

        train_iter = iter(train_loader)
        while self.step < tcfg.max_steps:
            if self.accum > 1:
                micro = [next(train_iter) for _ in range(self.accum)]
                batch = self._place_batch(
                    {k: np.stack([np.asarray(m[k]) for m in micro])
                     for k in micro[0]},
                    self.bspecs_accum,
                )
            else:
                batch = self._place_batch(next(train_iter), self.bspecs)
            self.params, self.opt_state, metrics = self.train_step(
                self.params, self.opt_state, batch
            )
            self.step += 1
            window_metrics.append(metrics)

            if self.step % tcfg.log_every_steps == 0:
                m = {
                    k: float(np.mean([float(w[k]) for w in window_metrics]))
                    for k in window_metrics[0]
                }
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                sps = tcfg.log_every_steps / dt
                logger.info(
                    "step %d | loss %.4f (base %.4f semantic %.4f) | "
                    "top5 %.3f | grad %.3f | %.2f it/s",
                    self.step, m["loss"], m["base_loss"], m["semantic_loss"],
                    m["top_5_accuracy"], m["grad_norm"], sps,
                )
                self._append_log({"step": self.step, **m, "it_per_s": sps})
                window_metrics = []

            if val_loader is not None and self.step % tcfg.val_every_steps == 0:
                self.validate(val_loader)

            if self.step % tcfg.ckpt_every_steps == 0:
                self.save_checkpoint()

        if self.step % tcfg.ckpt_every_steps != 0:
            self.save_checkpoint()

    def _place_batch(self, batch, specs):
        """Host-local numpy batch -> globally sharded device arrays.

        Single-host: plain device_put against the (dp, tp) specs.
        Multi-host (`parallel.mesh.init_distributed`): each host's loader
        yields only ITS dp rows (dataset sharded by `jax.process_index()`),
        and `jax.make_array_from_process_local_data` assembles the global
        batch without any cross-host copy of raw data. The global batch is
        batch_size x process_count."""
        if jax.process_count() > 1:
            return {
                k: jax.make_array_from_process_local_data(
                    specs[k], np.asarray(batch[k])
                )
                for k in batch
            }
        return {
            k: jax.device_put(jnp.asarray(v), specs[k])
            for k, v in batch.items()
        }

    def validate(self, val_loader):
        from fish_speech_tpu.train.loss import dual_ar_loss

        losses = []
        val_fn = jax.jit(
            lambda p, b: dual_ar_loss(p, self.cfg, b, remat=False)[1]
        )
        for i, batch in enumerate(val_loader):
            if i >= self.train_cfg.val_batches:
                break
            batch = self._place_batch(batch, self.bspecs)
            losses.append({k: float(v) for k, v in val_fn(self.params, batch).items()})
        if losses:
            m = {k: float(np.mean([x[k] for x in losses])) for k in losses[0]}
            logger.info("val @ step %d | loss %.4f | top5 %.3f",
                        self.step, m["loss"], m["top_5_accuracy"])
            self._append_log({"step": self.step, "val": m})

    def _append_log(self, record: dict):
        with open(self.out_dir / "metrics.jsonl", "a") as f:
            f.write(json.dumps(record) + "\n")


def _match_tree(spec_tree, params):
    """Extend a sharding-spec tree to cover extra (e.g. LoRA) leaves by
    replicating anything the spec tree doesn't know about."""
    from jax.sharding import NamedSharding

    def walk(spec, param):
        if isinstance(param, dict):
            spec = spec if isinstance(spec, dict) else {}
            return {k: walk(spec.get(k), param[k]) for k in param}
        if isinstance(param, (list, tuple)):
            spec = spec if isinstance(spec, (list, tuple)) else [None] * len(param)
            return [walk(s, p) for s, p in zip(spec, param)]
        if spec is None or isinstance(spec, dict):
            # replicate unknown leaves
            from jax.sharding import PartitionSpec

            return NamedSharding(_MESH[0], PartitionSpec())
        return spec

    # stash mesh from any NamedSharding in the tree
    leaves = [
        s for s in jax.tree_util.tree_leaves(
            spec_tree, is_leaf=lambda x: isinstance(x, NamedSharding)
        )
        if isinstance(s, NamedSharding)
    ]
    _MESH[0] = leaves[0].mesh
    return walk(spec_tree, params)


_MESH = [None]
