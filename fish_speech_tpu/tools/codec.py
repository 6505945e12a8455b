"""Codec round-trip CLI — the `fish_speech/models/dac/inference.py` surface.

Two modes, chosen by the input extension (reference behavior,
`dac/inference.py:71-121`):

  audio file in  -> codec ENCODE  -> sibling `.npy` code matrix (1+N, T')
  `.npy` file in -> codec DECODE  -> reconstructed waveform at the codec
                                     sample rate

    python -m fish_speech_tpu.tools.codec -i speech.wav -o codes.npy \
        --checkpoint-path checkpoints/s2-pro-tpu
    python -m fish_speech_tpu.tools.codec -i codes.npy -o fake.wav \
        --checkpoint-path checkpoints/s2-pro-tpu

Unlike the reference (hydra + torch + GPU device flags) this is one flat
CLI over the native checkpoint (`codec.safetensors` + `codec_config.json`,
`utils/checkpoint.load_dac`); audio in any supported container is resampled
to the codec rate on load.
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np

AUDIO_EXTENSIONS = {".wav", ".flac", ".mp3", ".ogg", ".opus", ".m4a", ".aac"}


@click.command()
@click.option("--input-path", "-i", required=True,
              type=click.Path(exists=True, path_type=Path))
@click.option("--output-path", "-o", default=Path("fake.wav"),
              type=click.Path(path_type=Path))
@click.option("--checkpoint-path", default="checkpoints/s2-pro-tpu",
              help="directory holding codec.safetensors + codec_config.json")
@click.option("--cpu", is_flag=True, help="force the CPU backend")
def main(input_path, output_path, checkpoint_path, cpu):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fish_speech_tpu.audio.io import load_audio, write_wav
    from fish_speech_tpu.models.dac.model import dac_encode, dac_from_indices
    from fish_speech_tpu.utils.checkpoint import load_dac

    params, cfg = load_dac(checkpoint_path)

    if input_path.suffix.lower() in AUDIO_EXTENSIONS:
        audio = load_audio(input_path, cfg.sample_rate)  # (T,) mono float32
        click.echo(
            f"Encoding {len(audio) / cfg.sample_rate:.2f}s of audio",
            err=True,
        )
        codes, lens = dac_encode(params, cfg, jnp.asarray(audio)[None, None])
        out = np.asarray(codes[0, :, : int(lens[0])])
        np.save(output_path.with_suffix(".npy"), out)
        click.echo(
            f"Saved code matrix {out.shape} -> "
            f"{output_path.with_suffix('.npy')}", err=True,
        )
    elif input_path.suffix.lower() == ".npy":
        indices = np.load(input_path)
        if indices.ndim != 2:
            raise click.ClickException(
                f"Expected a 2D (1+N, T') code matrix, got {indices.ndim}D"
            )
        click.echo(f"Decoding {indices.shape[1]} frames", err=True)
        wav = dac_from_indices(params, cfg, jnp.asarray(indices)[None])
        write_wav(output_path, np.asarray(wav[0, 0]), cfg.sample_rate)
        click.echo(
            f"Saved {wav.shape[-1] / cfg.sample_rate:.2f}s -> {output_path}",
            err=True,
        )
    else:
        raise click.ClickException(f"Unknown input type: {input_path.suffix}")


if __name__ == "__main__":
    main()
