"""Optimizer + train step factory.

DDP in the reference (`configs/base.yaml:18-21`, Lightning/NCCL) maps here to
a data-sharded `jax.jit`: parameters live sharded/replicated per the mesh
specs and XLA inserts the gradient psum automatically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from fish_speech_tpu.config import DualARConfig
from fish_speech_tpu.train.loss import dual_ar_loss


def weight_decay_mask(params):
    """Reference exclusion (`lit_module.py:44-57`): no decay for biases,
    norm scales, and embedding tables."""

    def keep(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(str(n) for n in names)
        if "embeddings" in joined:
            return False
        last = names[-1] if names else ""
        if str(last).startswith("b") and leaf.ndim == 1:  # bqkv, bo, b
            return False
        if "norm" in str(last) or "scale" in str(last) or str(last) in (
            "alpha", "alpha1", "alpha2", "gamma", "norm_w", "norm_b",
        ):
            return False
        if leaf.ndim == 1:
            return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def make_optimizer(
    lr=3e-4,
    weight_decay: float = 0.01,
    betas=(0.9, 0.95),
    grad_clip: Optional[float] = 1.0,
    params=None,
    trainable_mask=None,
):
    """AdamW + global-norm clip.

    trainable_mask: optional bool pytree (LoRA fine-tuning). When given,
    AdamW is wrapped in `optax.masked` so its f32 m/v state exists ONLY
    for trainable leaves — unmasked, a 5B model's optimizer state is
    ~40 GB and cannot live on a single 16 GB chip even though the frozen
    weights themselves fit. Frozen leaves pass through (their gradients
    are already zeroed by the train step, and their updates re-zeroed
    after, so pass-through is a no-op)."""
    txs = []
    if grad_clip is not None:
        txs.append(optax.clip_by_global_norm(grad_clip))
    wd_mask = weight_decay_mask if params is None else weight_decay_mask(params)
    if trainable_mask is not None and params is not None:
        # inside optax.masked the inner adamw sees the pruned tree, so its
        # weight-decay mask must be pruned the same way: keep decay only
        # where (decayable AND trainable)
        wd_full = weight_decay_mask(params)
        wd_mask = jax.tree_util.tree_map(
            lambda w, t: bool(w and t), wd_full, trainable_mask
        )
    adamw = optax.adamw(
        lr,
        b1=betas[0],
        b2=betas[1],
        weight_decay=weight_decay,
        mask=wd_mask,
    )
    if trainable_mask is not None:
        adamw = optax.masked(adamw, trainable_mask)
    txs.append(adamw)
    return optax.chain(*txs)


def make_train_step(cfg: DualARConfig, optimizer, trainable_filter=None,
                    grad_accum: int = 1):
    """Build a jittable train step.

    trainable_filter: optional pytree of bool (same structure as params);
    False leaves get zero gradient (used by LoRA fine-tuning).

    grad_accum: microbatches accumulated per optimizer step (Lightning's
    `accumulate_grad_batches`, reference `text2semantic_finetune.yaml:11`).
    When > 1, every batch leaf carries a leading axis of that size and the
    step `lax.scan`s over microbatches — activation memory stays one
    microbatch wide, gradients accumulate in float32 in a single
    params-sized buffer — then applies ONE update with the mean gradient
    (per-microbatch-mean averaging, matching Lightning/DDP semantics).
    """

    def _is_none(x):
        return x is None

    def _partition(params):
        """Split params into (trainable, frozen) trees; the other side's
        leaves become None (empty subtrees). With a filter, autodiff runs
        ONLY over the trainable side — a full-tree value_and_grad would
        materialize a params-sized gradient (10 GB on the bf16 flagship,
        blowing a 16 GB chip past device memory purely to compute leaves
        the mask zeroes anyway)."""
        train = jax.tree_util.tree_map(
            lambda t, p: p if t else None, trainable_filter, params
        )
        frozen = jax.tree_util.tree_map(
            lambda t, p: None if t else p, trainable_filter, params
        )
        return train, frozen

    def _combine(train, frozen):
        return jax.tree_util.tree_map(
            lambda a, b: b if a is None else a, train, frozen,
            is_leaf=_is_none,
        )

    def _expand(grads_train, params):
        """Trainable-only grads -> full-tree grads (zeros for frozen; XLA
        folds the zero branches through the masked optimizer)."""
        return jax.tree_util.tree_map(
            lambda g, p: jnp.zeros(p.shape, p.dtype) if g is None
            else g, grads_train, params, is_leaf=_is_none,
        )

    def train_step(params, opt_state, batch):
        if trainable_filter is not None:
            train_p, frozen_p = _partition(params)

            def loss_fn(tp, mb):
                return dual_ar_loss(_combine(tp, frozen_p), cfg, mb)

            diff_arg = train_p
        else:
            def loss_fn(p, mb):
                return dual_ar_loss(p, cfg, mb)

            diff_arg = params

        if grad_accum == 1:
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(diff_arg, batch)
        else:
            def body(gsum, mb):
                (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    diff_arg, mb
                )
                gsum = jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(jnp.float32), gsum, g
                )
                return gsum, dict(m)

            gz = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), diff_arg
            )
            gsum, ms = jax.lax.scan(body, gz, batch)
            grads = jax.tree_util.tree_map(
                lambda g, p: (g / grad_accum).astype(p.dtype), gsum, diff_arg
            )
            metrics = {k: jnp.mean(v) for k, v in ms.items()}
        if trainable_filter is not None:
            grads = _expand(grads, params)
        grads_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        if trainable_filter is not None:
            # adamw's decoupled weight decay would otherwise still move
            # frozen params (decay is grad-independent)
            updates = jax.tree_util.tree_map(
                lambda u, t: u if t else jnp.zeros_like(u), updates,
                trainable_filter,
            )
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = grads_norm
        return params, opt_state, metrics

    return train_step


# -- LR schedules (reference `fish_speech/scheduler.py`) --


def cosine_schedule_with_warmup(
    base_lr: float,
    num_warmup_steps,
    num_training_steps: int,
    num_cycles: float = 0.5,
    final_lr_ratio: float = 0.0,
):
    if 0 < num_warmup_steps < 1:
        num_warmup_steps = int(num_warmup_steps * num_training_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(num_warmup_steps, 1)
        progress = (step - num_warmup_steps) / jnp.maximum(
            num_training_steps - num_warmup_steps, 1
        )
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress))
        factor = jnp.where(
            step < num_warmup_steps, warm, jnp.maximum(final_lr_ratio, cos)
        )
        return base_lr * factor

    return schedule


def constant_schedule_with_warmup(base_lr: float, num_warmup_steps,
                                  num_training_steps: Optional[int] = None):
    if 0 < num_warmup_steps < 1:
        assert num_training_steps is not None
        num_warmup_steps = int(num_warmup_steps * num_training_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(num_warmup_steps, 1)
        return base_lr * jnp.minimum(warm, 1.0)

    return schedule
