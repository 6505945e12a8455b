"""Main TTS inference CLI (reference
`fish_speech/models/text2semantic/inference.py` `main`).

    python -m fish_speech_tpu.tools.tts \
        --text "<|speaker:0|>Hello world" \
        --checkpoint-path checkpoints/s2-pro-tpu \
        --output output/out.wav

Supports voice cloning via --prompt-audio/--prompt-tokens + --prompt-text,
writes codes_N.npy and optionally decodes to WAV.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import click
import numpy as np


@click.command()
@click.option("--text", type=str,
              default="<|speaker:0|>Hello, this is a test sentence.")
@click.option("--prompt-text", type=str, default=None, multiple=True)
@click.option("--prompt-tokens", type=click.Path(path_type=Path, exists=True),
              default=None, multiple=True)
@click.option("--prompt-audio", type=click.Path(path_type=Path, exists=True),
              default=None, multiple=True)
@click.option("--output", type=click.Path(path_type=Path), default=None)
@click.option("--num-samples", type=int, default=1)
@click.option("--max-new-tokens", type=int, default=0)
@click.option("--top-p", type=float, default=0.9)
@click.option("--top-k", type=int, default=30)
@click.option("--temperature", type=float, default=1.0)
@click.option("--checkpoint-path", type=click.Path(path_type=Path),
              default=Path("checkpoints/s2-pro-tpu"))
@click.option("--seed", type=int, default=42)
@click.option("--chunk-length", type=int, default=300)
@click.option("--output-dir", type=Path, default=Path("output"))
@click.option("--int8", is_flag=True, help="int8 weight-only quantization")
@click.option("--tiny", is_flag=True, help="tiny random models (smoke test)")
@click.option("--cpu", is_flag=True)
def main(text, prompt_text, prompt_tokens, prompt_audio, output, num_samples,
         max_new_tokens, top_p, top_k, temperature, checkpoint_path, seed,
         chunk_length, output_dir, int8, tiny, cpu):
    import jax
    import jax.numpy as jnp

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    from fish_speech_tpu.audio.io import load_audio, write_wav
    from fish_speech_tpu.config import SamplingConfig
    from fish_speech_tpu.generate import GenerationSession, generate_long
    from fish_speech_tpu.models import dual_ar
    from fish_speech_tpu.models.dac import dac_encode, dac_from_indices

    os.makedirs(output_dir, exist_ok=True)

    if prompt_text and not prompt_audio and not prompt_tokens:
        raise click.UsageError(
            "--prompt-text requires either --prompt-audio or --prompt-tokens"
        )

    t0 = time.time()
    if tiny:
        from fish_speech_tpu.config import dac_tiny, dual_ar_tiny
        from fish_speech_tpu.models.dac import init_dac
        from fish_speech_tpu.tokenizer import build_test_tokenizer

        tokenizer = build_test_tokenizer()
        dac_cfg = dac_tiny()
        cfg = dual_ar_tiny(
            vocab_size=tokenizer.vocab_size,
            semantic_begin_id=tokenizer.semantic_begin_id,
            semantic_end_id=tokenizer.semantic_end_id,
            im_end_id=tokenizer.im_end_id,
            codebook_size=4096,
            num_codebooks=dac_cfg.rvq.total_codebooks,
        )
        dtype = jnp.float32
        params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=dtype)
        dac_params = init_dac(jax.random.PRNGKey(1), dac_cfg, dtype=dtype)
    else:
        import dataclasses

        from fish_speech_tpu.tokenizer import FishTokenizer
        from fish_speech_tpu.utils.checkpoint import load_dac, load_dual_ar

        dtype = jnp.bfloat16
        params, cfg = load_dual_ar(checkpoint_path, dtype=dtype)
        tokenizer = FishTokenizer.from_pretrained(str(checkpoint_path))
        cfg = dataclasses.replace(
            cfg,
            semantic_begin_id=tokenizer.semantic_begin_id,
            semantic_end_id=tokenizer.semantic_end_id,
            im_end_id=tokenizer.im_end_id,
        ).resolve()
        dac_params, dac_cfg = load_dac(checkpoint_path, dtype=dtype)

    if int8:
        from fish_speech_tpu.ops.quant import quantize_dual_ar

        params = jax.jit(quantize_dual_ar, donate_argnums=(0,))(params)

    click.echo(f"Models ready in {time.time() - t0:.1f}s", err=True)
    session = GenerationSession(params, cfg, SamplingConfig(), dtype=dtype)

    # prompts: --prompt-audio takes priority over --prompt-tokens
    prompt_tokens_list = None
    if prompt_audio:
        prompt_tokens_list = []
        for p in prompt_audio:
            wav = load_audio(str(p), dac_cfg.sample_rate)
            codes, lens = dac_encode(
                dac_params, dac_cfg, jnp.asarray(wav[None, None, :])
            )
            prompt_tokens_list.append(np.asarray(codes[0])[:, : int(lens[0])])
    elif prompt_tokens:
        prompt_tokens_list = [np.load(p) for p in prompt_tokens]

    generator = generate_long(
        session=session,
        tokenizer=tokenizer,
        text=text,
        num_samples=num_samples,
        max_new_tokens=max_new_tokens,
        top_p=top_p,
        top_k=top_k,
        temperature=temperature,
        chunk_length=chunk_length,
        prompt_text=list(prompt_text) if prompt_text else None,
        prompt_tokens=prompt_tokens_list,
        seed=seed,
    )

    idx = 0
    codes_acc = []
    t0 = time.time()
    for response in generator:
        if response.action == "sample":
            codes_acc.append(response.codes)
            n = response.codes.shape[1]
            dt = time.time() - t0
            click.echo(
                f"Sampled {n} frames in {dt:.2f}s "
                f"({n / max(dt, 1e-9):.1f} tok/s): {response.text!r}",
                err=True,
            )
            t0 = time.time()
        elif response.action == "next" and codes_acc:
            merged = np.concatenate(codes_acc, axis=1)
            codes_path = output_dir / f"codes_{idx}.npy"
            np.save(codes_path, merged)
            click.echo(f"Saved codes to {codes_path}", err=True)
            if output:
                audio = dac_from_indices(
                    dac_params, dac_cfg, jnp.asarray(merged[None])
                )
                out_path = (
                    output if num_samples == 1
                    else output.with_stem(f"{output.stem}_{idx}")
                )
                write_wav(out_path, np.asarray(audio)[0, 0], dac_cfg.sample_rate)
                click.echo(f"Saved audio to {out_path}", err=True)
            codes_acc = []
            idx += 1


if __name__ == "__main__":
    main()
