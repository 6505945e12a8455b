"""Batch audio -> VQ-code extractor (reference `tools/vqgan/extract_vq.py`).

Walks a folder of audio files, encodes them with the DAC codec in device
batches, and writes sibling `.npy` code files. Multi-host sharding via
--shard-id/--num-shards (or RANK/WORLD_SIZE env, reference-compatible).

    python -m fish_speech_tpu.tools.extract_vq data/ \
        --checkpoint-path checkpoints/s2-pro-tpu --batch-size 16
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import click
import numpy as np

AUDIO_EXTENSIONS = {".wav", ".mp3", ".flac", ".ogg", ".m4a"}


def list_audio_files(folder: Path, recursive=True):
    it = folder.rglob("*") if recursive else folder.glob("*")
    return sorted(p for p in it if p.suffix.lower() in AUDIO_EXTENSIONS)


@click.command()
@click.argument("folder", type=click.Path(exists=True, path_type=Path))
@click.option("--checkpoint-path", type=str, default="checkpoints/s2-pro-tpu")
@click.option("--batch-size", type=int, default=16)
@click.option("--max-seconds", type=float, default=30.0,
              help="pad/crop bucket size in seconds")
@click.option("--shard-id", type=int, default=None)
@click.option("--num-shards", type=int, default=None)
@click.option("--tiny", is_flag=True, help="tiny random codec (testing)")
@click.option("--overwrite", is_flag=True)
@click.option("--cpu", is_flag=True, help="force the CPU backend")
def main(folder, checkpoint_path, batch_size, max_seconds, shard_id,
         num_shards, tiny, overwrite, cpu):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fish_speech_tpu.audio.io import load_audio
    from fish_speech_tpu.models.dac import dac_encode, init_dac

    shard_id = shard_id if shard_id is not None else int(os.getenv("RANK", 0))
    num_shards = (
        num_shards if num_shards is not None else int(os.getenv("WORLD_SIZE", 1))
    )

    if tiny:
        from fish_speech_tpu.config import dac_tiny

        cfg = dac_tiny()
        params = init_dac(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    else:
        from fish_speech_tpu.utils.checkpoint import load_dac

        params, cfg = load_dac(checkpoint_path, dtype=jnp.bfloat16)

    files = list_audio_files(folder)[shard_id::num_shards]
    if not overwrite:
        files = [f for f in files if not f.with_suffix(".npy").exists()]
    click.echo(f"[shard {shard_id}/{num_shards}] {len(files)} files to process",
               err=True)

    bucket = int(max_seconds * cfg.sample_rate)
    bucket = -(-bucket // cfg.frame_length) * cfg.frame_length  # frame multiple

    encode = jax.jit(lambda p, a, l: dac_encode(p, cfg, a, l))

    t0 = time.time()
    total_sec = 0.0
    for i in range(0, len(files), batch_size):
        chunk = files[i : i + batch_size]
        audios = np.zeros((len(chunk), 1, bucket), dtype=np.float32)
        lengths = np.zeros(len(chunk), dtype=np.int32)
        for j, f in enumerate(chunk):
            wav = load_audio(str(f), cfg.sample_rate)[:bucket]
            audios[j, 0, : len(wav)] = wav
            lengths[j] = len(wav)
            total_sec += len(wav) / cfg.sample_rate
        codes, code_lens = encode(
            params, jnp.asarray(audios), jnp.asarray(lengths)
        )
        codes = np.asarray(codes)
        code_lens = np.asarray(code_lens)
        for j, f in enumerate(chunk):
            np.save(f.with_suffix(".npy"), codes[j, :, : code_lens[j]])
        click.echo(
            f"[shard {shard_id}] {i + len(chunk)}/{len(files)} "
            f"({total_sec / max(time.time() - t0, 1e-9):.1f} audio-s/s)",
            err=True,
        )


if __name__ == "__main__":
    main()
