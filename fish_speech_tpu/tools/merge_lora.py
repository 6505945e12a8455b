"""Merge LoRA weights from a training checkpoint into a base model
(reference `tools/llama/merge_lora.py`, with its L1-validation step).

    python -m fish_speech_tpu.tools.merge_lora \
        --base checkpoints/s2-pro-tpu \
        --lora results/run/checkpoints/step_00001000 \
        --lora-r 8 --lora-alpha 16 \
        --output checkpoints/s2-pro-tpu-merged
"""

from __future__ import annotations

from pathlib import Path

import click


@click.command()
@click.option("--base", type=click.Path(exists=True), required=True)
@click.option("--lora", "lora_path", type=click.Path(exists=True), required=True)
@click.option("--lora-r", type=int, required=True)
@click.option("--lora-alpha", type=float, required=True)
@click.option("--lora-targets", type=str,
              default="attention,mlp,embeddings,output")
@click.option("--output", type=click.Path(), required=True)
def main(base, lora_path, lora_r, lora_alpha, lora_targets, output):
    import jax

    # file -> file transform: no reason to claim (or wait for) an
    # accelerator — same policy as tools/quantize.py
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from fish_speech_tpu.models.lora import (
        LoraConfig,
        add_lora,
        apply_lora_config,
        extract_lora,
        merge_lora,
    )
    from fish_speech_tpu.utils.checkpoint import load_dual_ar, save_dual_ar

    params, cfg = load_dual_ar(base, dtype=jnp.float32)
    lcfg = LoraConfig(
        r=lora_r, lora_alpha=lora_alpha, target_modules=lora_targets.split(",")
    )
    params = add_lora(params, cfg, lcfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    cfg_l = apply_lora_config(cfg, lcfg)

    # restore LoRA-only leaves from the training checkpoint
    ckptr = ocp.StandardCheckpointer()
    target = {"params": extract_lora(params)}
    restored = ckptr.restore(
        Path(lora_path).absolute(),
        {"params": target["params"], "opt_state": None},
    )

    def graft(node, sub):
        if isinstance(sub, dict):
            for k, v in sub.items():
                if isinstance(v, dict) and isinstance(node.get(k), dict):
                    graft(node[k], v)
                else:
                    node[k] = v

    graft(params, restored["params"])

    before = {k: np.asarray(v) for k, v in {
        "wqkv": params["layers"]["wqkv"][0],
    }.items()}
    merged = merge_lora(params, cfg_l)

    # L1 validation: merged weights should differ from base where LoRA
    # was active (reference `merge_lora.py:77-92`)
    l1 = float(
        jnp.mean(jnp.abs(merged["layers"]["wqkv"][0] - before["wqkv"]))
    )
    click.echo(f"L1 delta on layers.0.wqkv after merge: {l1:.6f}")

    save_dual_ar(output, merged, cfg)
    # carry tokenizer files along
    import shutil

    for name in ("tokenizer.json",):
        src = Path(base) / name
        if src.exists():
            shutil.copy(src, Path(output) / name)
    click.echo(f"Merged model -> {output}")


if __name__ == "__main__":
    main()
