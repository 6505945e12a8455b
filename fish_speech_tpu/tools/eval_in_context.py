"""In-context evaluation: per-frame semantic-loss curves across checkpoints
(reference `tools/llama/eval_in_context.py`).

Feeds (reference audio codes + target audio codes) through the model
teacher-forced and plots/reports the per-frame loss on the target span —
lower and flatter = better in-context voice following.

    python -m fish_speech_tpu.tools.eval_in_context \
        --checkpoint-path A --checkpoint-path B \
        --reference-codes ref.npy --reference-text "..." \
        --target-codes tgt.npy --target-text "..."
"""

from __future__ import annotations

import json
from pathlib import Path

import click
import numpy as np


def per_frame_semantic_loss(params, cfg, inp, labels):
    import jax
    import jax.numpy as jnp

    from fish_speech_tpu.models.dual_ar import forward_train

    token_logits, codebook_logits = forward_train(
        params, cfg, jnp.asarray(inp[None]), labels=jnp.asarray(labels[None]),
        remat=False,
    )
    cb_labels = np.transpose(labels[1:], (1, 0))  # (T, C)
    logp = jax.nn.log_softmax(codebook_logits[0], axis=-1)  # (T, C, K)
    safe = np.clip(cb_labels, 0, cfg.codebook_size - 1)
    nll = -np.take_along_axis(np.asarray(logp), safe[..., None], axis=-1)[..., 0]
    # train-loss mask semantics (train/loss.py): codebook loss counts only
    # where the row-0 label is a LOSS-BEARING semantic token — the encode
    # stores codebook labels under the reference prompt too (cal_loss only
    # gates row 0), so without this intersection the "in-context" curve
    # would silently average the reference span in with the target span
    sem_valid = (labels[0] >= cfg.semantic_begin_id) & (
        labels[0] <= cfg.semantic_end_id
    )
    valid = (cb_labels != -100) & sem_valid[:, None]
    per_frame = (nll * valid).sum(-1) / np.maximum(valid.sum(-1), 1)
    return per_frame, valid.any(-1)


@click.command()
@click.option("--checkpoint-path", "checkpoints", type=click.Path(exists=True),
              multiple=True, required=True)
@click.option("--reference-codes", type=click.Path(exists=True), required=True)
@click.option("--reference-text", type=str, required=True)
@click.option("--target-codes", type=click.Path(exists=True), required=True)
@click.option("--target-text", type=str, required=True)
@click.option("--output", type=click.Path(path_type=Path),
              default=Path("output/in_context_loss.json"))
@click.option("--cpu", is_flag=True, help="force the CPU backend")
def main(checkpoints, reference_codes, reference_text, target_codes,
         target_text, output, cpu):
    import dataclasses

    import jax
    import jax.numpy as jnp

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    from fish_speech_tpu.generate import build_base_conversation
    from fish_speech_tpu.sequence import Message, TextPart, VQPart
    from fish_speech_tpu.tokenizer import FishTokenizer
    from fish_speech_tpu.utils.checkpoint import load_dual_ar

    ref = np.load(reference_codes)
    tgt = np.load(target_codes)

    results = {}
    for ckpt in checkpoints:
        params, cfg = load_dual_ar(ckpt, dtype=jnp.float32)
        tokenizer = FishTokenizer.from_pretrained(ckpt)
        cfg = dataclasses.replace(
            cfg,
            semantic_begin_id=tokenizer.semantic_begin_id,
            semantic_end_id=tokenizer.semantic_end_id,
            im_end_id=tokenizer.im_end_id,
        ).resolve()

        conv = build_base_conversation([reference_text], [ref])
        conv.append(Message(role="user", parts=[TextPart(text=target_text)]))
        conv.append(
            Message(role="assistant", modality="voice",
                    parts=[VQPart(codes=tgt, cal_loss=True)], cal_loss=True)
        )
        enc = conv.encode(tokenizer, add_shift=True)
        t = len(enc.tokens)
        inp = np.zeros((cfg.num_codebooks + 1, t), dtype=np.int32)
        inp[0] = enc.tokens
        all_vq = np.concatenate(enc.vq_parts, axis=1)
        inp[1:, enc.vq_mask_tokens] = all_vq[:, : enc.vq_mask_tokens.sum()]
        labels = np.full((cfg.num_codebooks + 1, t), -100, dtype=np.int32)
        labels[0] = enc.labels
        labels[1:, enc.vq_mask_labels] = all_vq[
            :, all_vq.shape[1] - enc.vq_mask_labels.sum() :
        ]

        per_frame, mask = per_frame_semantic_loss(params, cfg, inp, labels)
        curve = per_frame[mask].tolist()
        results[str(ckpt)] = {
            "mean_loss": float(np.mean(curve)),
            "per_frame": curve,
        }
        click.echo(f"{ckpt}: mean in-context semantic loss {np.mean(curve):.4f}")

    output.parent.mkdir(parents=True, exist_ok=True)
    output.write_text(json.dumps(results, indent=2))
    click.echo(f"Wrote {output}")


if __name__ == "__main__":
    main()
