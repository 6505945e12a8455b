"""Reference-checkpoint parity harness (BASELINE.md gates).

Given a reference PyTorch checkpoint converted to native format, runs the
parity gates from BASELINE.json:

  1. codec round-trip: encode a WAV, decode the codes, report SNR/shape
     against a saved reference output (or just self-consistency when no
     golden file is provided);
  2. greedy semantic-token decode of a fixed prompt — prints the token ids
     so two frameworks can be diffed exactly;
  3. teacher-forced logit fingerprint: mean/std/top-1 of slow and fast
     logits over a fixed prompt (cheap cross-framework checksum that
     catches conversion mistakes without bit-level RNG parity).

    python -m fish_speech_tpu.tools.parity_check \
        --checkpoint-path checkpoints/s2-pro-tpu \
        --wav ref.wav --text "hello world" \
        [--golden golden.json] [--save-golden golden.json]

On the PyTorch side, the same quantities come from the reference's
`generate` with temperature->greedy and `DAC.encode/from_indices`.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import click
import numpy as np


@click.command()
@click.option("--checkpoint-path", type=click.Path(exists=True), required=True)
@click.option("--wav", type=click.Path(exists=True), default=None)
@click.option("--text", type=str, default="Hello world.")
@click.option("--max-new-tokens", type=int, default=64)
@click.option("--golden", type=click.Path(exists=True), default=None,
              help="compare against a saved golden file")
@click.option("--save-golden", type=click.Path(), default=None)
@click.option("--cpu", is_flag=True, help="force the CPU backend")
def main(checkpoint_path, wav, text, max_new_tokens, golden, save_golden, cpu):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fish_speech_tpu.audio.io import load_audio
    from fish_speech_tpu.config import SamplingConfig
    from fish_speech_tpu.generate import GenerationSession, generate_long
    from fish_speech_tpu.models import dual_ar
    from fish_speech_tpu.models.dac import dac_encode, dac_from_indices
    from fish_speech_tpu.tokenizer import FishTokenizer
    from fish_speech_tpu.utils.checkpoint import load_dac, load_dual_ar

    report = {}

    params, cfg = load_dual_ar(checkpoint_path, dtype=jnp.float32)
    tokenizer = FishTokenizer.from_pretrained(checkpoint_path)
    cfg = dataclasses.replace(
        cfg,
        semantic_begin_id=tokenizer.semantic_begin_id,
        semantic_end_id=tokenizer.semantic_end_id,
        im_end_id=tokenizer.im_end_id,
    ).resolve()

    # -- gate 3: teacher-forced logit fingerprint --
    prompt_ids = tokenizer.encode(text)
    inp = np.zeros((1, cfg.num_codebooks + 1, len(prompt_ids)), np.int32)
    inp[0, 0] = prompt_ids
    tok_logits, cb_logits = dual_ar.forward_train(
        params, cfg, jnp.asarray(inp), remat=False
    )
    report["logit_fingerprint"] = {
        "token_mean": float(np.mean(np.asarray(tok_logits))),
        "token_std": float(np.std(np.asarray(tok_logits))),
        "token_argmax_last": int(np.argmax(np.asarray(tok_logits[0, -1]))),
        "codebook_mean": float(np.mean(np.asarray(cb_logits))),
        "codebook_argmax_last": int(np.argmax(np.asarray(cb_logits[0, -1, -1]))),
    }

    # -- gate 2: greedy semantic decode --
    session = GenerationSession(
        params, cfg, SamplingConfig(), dtype=jnp.float32
    )
    responses = list(
        generate_long(
            session=session, tokenizer=tokenizer, text=text,
            max_new_tokens=max_new_tokens,
            temperature=0.01, top_p=1.0, top_k=1,  # greedy
            seed=0,
        )
    )
    codes = [r.codes for r in responses if r.action == "sample"]
    merged = np.concatenate(codes, axis=1) if codes else np.zeros((cfg.num_codebooks, 0))
    report["greedy_decode"] = {
        "n_frames": int(merged.shape[1]),
        "codes_row0": merged[0, :32].tolist(),
        "codes_sha": _sha(merged),
    }

    # -- gate 1: codec round trip --
    try:
        dac_params, dac_cfg = load_dac(checkpoint_path, dtype=jnp.float32)
        if wav:
            audio = load_audio(wav, dac_cfg.sample_rate)
        else:
            rng = np.random.default_rng(0)
            audio = (rng.normal(size=dac_cfg.frame_length * 8) * 0.1).astype(
                np.float32
            )
        enc, lens = dac_encode(dac_params, dac_cfg, jnp.asarray(audio[None, None]))
        codes_np = np.asarray(enc[0])[:, : int(lens[0])]
        out = dac_from_indices(dac_params, dac_cfg, jnp.asarray(codes_np[None]))
        out_np = np.asarray(out[0, 0])[: len(audio)]
        noise = audio[: len(out_np)] - out_np
        snr = 10 * np.log10(
            (audio[: len(out_np)] ** 2).mean() / max((noise ** 2).mean(), 1e-12)
        )
        report["codec_roundtrip"] = {
            "n_frames": int(lens[0]),
            "codes_sha": _sha(codes_np),
            "snr_db": float(snr),
        }
    except FileNotFoundError:
        report["codec_roundtrip"] = "no codec in checkpoint"

    click.echo(json.dumps(report, indent=2))

    if save_golden:
        Path(save_golden).write_text(json.dumps(report, indent=2))
        click.echo(f"Saved golden -> {save_golden}")
    if golden:
        want = json.loads(Path(golden).read_text())
        mismatches = _diff(want, report)
        if mismatches:
            for m in mismatches:
                click.echo(f"MISMATCH: {m}")
            raise SystemExit(1)
        click.echo("PARITY OK")


def _sha(arr) -> str:
    import hashlib

    return hashlib.sha256(np.ascontiguousarray(arr, np.int32).tobytes()).hexdigest()[:16]


def _diff(want, got, path=""):
    out = []
    if isinstance(want, dict) and isinstance(got, dict):
        for k in want:
            out.extend(_diff(want[k], got.get(k), f"{path}.{k}"))
    elif isinstance(want, float) and isinstance(got, float):
        if abs(want - got) > max(1e-3 * abs(want), 1e-4):
            out.append(f"{path}: {want} != {got}")
    elif want != got:
        out.append(f"{path}: {want} != {got}")
    return out


if __name__ == "__main__":
    main()
