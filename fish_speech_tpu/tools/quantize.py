"""Offline weight-only PTQ: write an int8-quantized native checkpoint
(reference `tools/llama/quantize.py`, gpt-fast style; int8 per-channel).

    python -m fish_speech_tpu.tools.quantize \
        --checkpoint-path checkpoints/s2-pro-tpu \
        --mode int8
"""

from __future__ import annotations

import shutil
from pathlib import Path

import click


@click.command()
@click.option("--checkpoint-path", type=click.Path(exists=True), required=True)
@click.option("--output", type=click.Path(), default=None,
              help="default: <checkpoint>-int8")
@click.option("--mode", type=click.Choice(["int8"]), default="int8")
def main(checkpoint_path, output, mode):
    import jax

    from fish_speech_tpu.ops.quant import quantize_dual_ar
    from fish_speech_tpu.utils.checkpoint import load_dual_ar, save_dual_ar

    jax.config.update("jax_platforms", "cpu")
    src = Path(checkpoint_path)
    out = Path(output) if output else src.with_name(src.name + f"-{mode}")

    params, cfg = load_dual_ar(src, dtype=None)
    qparams = quantize_dual_ar(params)
    save_dual_ar(out, qparams, cfg)
    for name in ("tokenizer.json",):
        if (src / name).exists():
            shutil.copy(src / name, out / name)
    if (src / "codec.safetensors").exists():
        shutil.copy(src / "codec.safetensors", out / "codec.safetensors")
        shutil.copy(src / "codec_config.json", out / "codec_config.json")
    click.echo(f"Quantized checkpoint -> {out}")


if __name__ == "__main__":
    main()
