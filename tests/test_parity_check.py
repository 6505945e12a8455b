"""Parity harness smoke test: build a native checkpoint (random weights),
save a golden, re-run against it -> PARITY OK; perturb weights -> mismatch."""

import jax
import jax.numpy as jnp
import numpy as np
from click.testing import CliRunner

from fish_speech_tpu.config import dac_tiny, dual_ar_tiny
from fish_speech_tpu.models.dac import init_dac
from fish_speech_tpu.models.dual_ar import init_dual_ar
from fish_speech_tpu.tools.parity_check import main
from fish_speech_tpu.utils.checkpoint import save_dac, save_dual_ar


def make_ckpt(tmp_path, tokenizer, seed=0):
    dac_cfg = dac_tiny()
    cfg = dual_ar_tiny(
        vocab_size=tokenizer.vocab_size,
        semantic_begin_id=tokenizer.semantic_begin_id,
        semantic_end_id=tokenizer.semantic_end_id,
        im_end_id=tokenizer.im_end_id,
        codebook_size=4096,
        num_codebooks=dac_cfg.rvq.total_codebooks,
    )
    params = init_dual_ar(jax.random.PRNGKey(seed), cfg, dtype=jnp.float32)
    save_dual_ar(tmp_path, params, cfg, tokenizer)
    save_dac(tmp_path, init_dac(jax.random.PRNGKey(1), dac_cfg, jnp.float32),
             dac_cfg)
    return tmp_path


def test_parity_roundtrip(tmp_path, tokenizer):
    ckpt = make_ckpt(tmp_path / "ckpt", tokenizer)
    golden = tmp_path / "golden.json"
    runner = CliRunner()
    r = runner.invoke(
        main,
        ["--checkpoint-path", str(ckpt), "--max-new-tokens", "6",
         "--save-golden", str(golden)],
        catch_exceptions=False,
    )
    assert r.exit_code == 0 and golden.exists()

    r2 = runner.invoke(
        main,
        ["--checkpoint-path", str(ckpt), "--max-new-tokens", "6",
         "--golden", str(golden)],
        catch_exceptions=False,
    )
    assert r2.exit_code == 0
    assert "PARITY OK" in r2.output


def test_parity_detects_mismatch(tmp_path, tokenizer):
    ckpt_a = make_ckpt(tmp_path / "a", tokenizer, seed=0)
    ckpt_b = make_ckpt(tmp_path / "b", tokenizer, seed=123)
    golden = tmp_path / "golden.json"
    runner = CliRunner()
    runner.invoke(
        main,
        ["--checkpoint-path", str(ckpt_a), "--max-new-tokens", "6",
         "--save-golden", str(golden)],
        catch_exceptions=False,
    )
    r = runner.invoke(
        main,
        ["--checkpoint-path", str(ckpt_b), "--max-new-tokens", "6",
         "--golden", str(golden)],
    )
    assert r.exit_code == 1
    assert "MISMATCH" in r.output
