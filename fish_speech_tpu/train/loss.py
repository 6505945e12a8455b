"""Dual cross-entropy loss for the Dual-AR model.

Reference semantics: `lit_module.py:109-204` — base CE over the text row,
semantic CE over all codebooks at semantic positions (selected by the row-0
labels), top-5 accuracy excluding pad (code 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import DualARConfig
from fish_speech_tpu.models.dual_ar import forward_train

IGNORE_INDEX = -100
CODEBOOK_PAD_TOKEN_ID = 0


def masked_cross_entropy(logits, labels, valid):
    """Mean CE over positions where valid; logits (..., V), labels (...)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    valid = valid.astype(jnp.float32)
    denom = jnp.maximum(valid.sum(), 1.0)
    return (nll * valid).sum() / denom


def dual_ar_loss(params, cfg: DualARConfig, batch, remat=None):
    """Compute loss + metrics.

    batch: dict with
      inputs:  (B, C+1, T) int32
      labels:  (B, C+1, T) int32 with IGNORE_INDEX outside loss positions
      pad_mask: (B, T) bool, True where padded (optional)
    """
    labels = batch["labels"]
    token_logits, codebook_logits = forward_train(
        params, cfg, batch["inputs"], labels=labels,
        pad_mask=batch.get("pad_mask"), remat=remat,
    )

    token_labels = labels[:, 0]  # (B, T)
    base_valid = token_labels != IGNORE_INDEX
    base_loss = masked_cross_entropy(token_logits, token_labels, base_valid)

    # semantic positions: row-0 label in the semantic range
    semantic_mask = (token_labels >= cfg.semantic_begin_id) & (
        token_labels <= cfg.semantic_end_id
    )  # (B, T)
    cb_labels = jnp.transpose(labels[:, 1:, :], (0, 2, 1))  # (B, T, C)
    cb_valid = (cb_labels != IGNORE_INDEX) & semantic_mask[..., None]
    semantic_loss = masked_cross_entropy(codebook_logits, cb_labels, cb_valid)

    loss = base_loss + semantic_loss

    # top-5 accuracy (excluding codebook pad), rank-count form: the label
    # is in the top 5 iff fewer than 5 logits strictly exceed its own.
    # Equivalent to lax.top_k membership for distinct logits (ties are
    # measure-zero with real weights) and avoids materializing a sort of
    # the whole vocab axis — the top_k lowering cost a measured 40 ms/step
    # (3%) of the flagship finetune step on v5e.
    acc_mask = cb_valid & (cb_labels != CODEBOOK_PAD_TOKEN_ID)
    safe_cb = jnp.clip(cb_labels, 0, codebook_logits.shape[-1] - 1)
    label_logit = jnp.take_along_axis(
        codebook_logits, safe_cb[..., None], axis=-1
    )
    rank = (codebook_logits > label_logit).sum(axis=-1)  # (B, T, C)
    correct = (rank < 5) & acc_mask
    denom = jnp.maximum(acc_mask.sum(), 1)
    accuracy = correct.sum() / denom

    metrics = {
        "loss": loss,
        "base_loss": base_loss,
        "semantic_loss": semantic_loss,
        "top_5_accuracy": accuracy,
    }
    return loss, metrics
