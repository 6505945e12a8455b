"""Offline weight-only PTQ: write an int8- or int4-quantized native
checkpoint (reference `tools/llama/quantize.py:242-420` writes both int8
per-channel and int4 groupwise gpt-fast layouts; here int4 is the packed
half-split layout `ops/quant.quantize_int4` that the runtime `mm` and the
Pallas fused kernel consume directly).

    python -m fish_speech_tpu.tools.quantize \
        --checkpoint-path checkpoints/s2-pro-tpu \
        --mode int8            # recommended on v5e: faster than int4
    python -m fish_speech_tpu.tools.quantize \
        --checkpoint-path checkpoints/s2-pro-tpu \
        --mode int4 --group-size 128

int8 is the recommended serving config on v5e — the measured int4 decode
path is SLOWER there (HBM-bound decode gains < unpack cost; numbers in
`ops/pallas_int4.py`) — but the offline tool writes both for capability
parity with the reference CLI; heads stay int8 in both modes.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import click


@click.command()
@click.option("--checkpoint-path", type=click.Path(exists=True), required=True)
@click.option("--output", type=click.Path(), default=None,
              help="default: <checkpoint>-<mode>")
@click.option("--mode", type=click.Choice(["int8", "int4"]), default="int8")
@click.option("--group-size", type=int, default=128,
              help="int4 quantization group size along the input dim "
                   "(auto-halved per layer until it divides the dim, "
                   "matching the runtime rule)")
def main(checkpoint_path, output, mode, group_size):
    import jax

    from fish_speech_tpu.ops.quant import quantize_dual_ar
    from fish_speech_tpu.utils.checkpoint import load_dual_ar, save_dual_ar

    jax.config.update("jax_platforms", "cpu")
    src = Path(checkpoint_path)
    out = Path(output) if output else src.with_name(src.name + f"-{mode}")

    params, cfg = load_dual_ar(src, dtype=None)
    qparams = quantize_dual_ar(params, mode=mode, group_size=group_size)
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
