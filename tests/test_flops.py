"""Validate the analytic FLOPs accounting (`utils/flops.py`) against
XLA's own cost analysis on 1-LAYER configs.

Why 1-layer: every stack here rolls its layer loop into `lax.scan`, and
HLO cost analysis counts a loop body ONCE — at depth 1 that's exact, so
the analytic formulas can be pinned tightly. (At real depths the XLA
number undercounts by ~the layer count, which is exactly why the bench
uses the analytic numbers for MFU.)

Known accounting differences, reflected in the tolerance bands:
- analytic counts causal attention at ctx/2 (the useful work; the MFU
  convention) while XLA counts the dense T^2 GEMMs it actually runs;
- analytic skips elementwise work (norms, activations, losses, optimizer
  update) — <2% at these shapes;
- analytic counts conv_transpose MACs per INPUT position times kernel
  (the useful work); XLA's conv cost model agrees to ~2% (it normalizes
  out the input dilation, and the causal crop drops a few tail
  positions the per-input count includes).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import DACConfig, dual_ar_tiny
from fish_speech_tpu.models import dual_ar
from fish_speech_tpu.utils import flops as F


def _xla_flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca["flops"])


@pytest.fixture(scope="module")
def one_layer_cfg():
    return dual_ar_tiny(
        vocab_size=1024, n_layer=1, dim=256, n_head=4, n_local_heads=2,
        head_dim=64, intermediate_size=512, max_seq_len=256,
        codebook_size=64, num_codebooks=4, n_fast_layer=1, fast_dim=128,
        fast_n_head=2, fast_n_local_heads=1, fast_head_dim=64,
        fast_intermediate_size=256, tie_word_embeddings=False,
    ).resolve()


def _train_batch(cfg, b, t, rng):
    inputs = np.zeros((b, cfg.num_codebooks + 1, t), dtype=np.int32)
    inputs[:, 0] = rng.integers(10, 1000, size=(b, t))
    return {
        "inputs": jnp.asarray(inputs),
        "labels": jnp.asarray(inputs),
        "pad_mask": jnp.zeros((b, t), bool),
    }


def test_forward_flops_match_xla(one_layer_cfg):
    cfg = one_layer_cfg
    b, t = 2, 256
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg)
    batch = _train_batch(cfg, b, t, np.random.default_rng(0))

    def fwd(p, inp):
        return dual_ar.forward_train(p, cfg, inp, remat=False)

    measured = _xla_flops(fwd, params, batch["inputs"])
    analytic = F.dual_ar_forward_flops(cfg, b, t)["total"]
    # causal halving puts analytic slightly under XLA's dense count
    assert 0.98 < measured / analytic < 1.25, (measured, analytic)


def test_train_step_flops_match_xla(one_layer_cfg):
    from fish_speech_tpu.train.step import make_optimizer, make_train_step

    cfg = one_layer_cfg
    b, t = 2, 256
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1e-4, params=params)
    opt_state = opt.init(params)
    batch = _train_batch(cfg, b, t, np.random.default_rng(1))
    cfg_noremat = dataclasses.replace(cfg, use_gradient_checkpointing=False)
    step = make_train_step(cfg_noremat, opt)

    measured = _xla_flops(step, params, opt_state, batch)
    plan = F.dual_ar_train_step_flops(cfg, b, t, mode="full", remat=False)
    assert plan["total"] == plan["hfu_total"]  # remat=False
    # elementwise (CE losses, adamw update, grad norm) rides on top of the
    # GEMM count; backward of the dense-causal attention widens the band
    assert 0.98 < measured / plan["total"] < 1.35, (measured, plan)


def test_lora_vs_full_step_ratio(one_layer_cfg):
    """The LoRA (frozen-base) step skips the dW GEMMs of frozen weights;
    the analytic 2x-vs-3x weight multiplier must track XLA's ratio."""
    from fish_speech_tpu.models.lora import (LoraConfig, add_lora,
                                            apply_lora_config, lora_filter)
    from fish_speech_tpu.train.step import make_optimizer, make_train_step

    cfg = dataclasses.replace(one_layer_cfg,
                              use_gradient_checkpointing=False)
    b, t = 2, 256
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg)
    batch = _train_batch(cfg, b, t, np.random.default_rng(2))

    opt = make_optimizer(lr=1e-4, params=params)
    full = _xla_flops(make_train_step(cfg, opt), params, opt.init(params),
                      batch)

    lcfg = LoraConfig(r=8, lora_alpha=16.0)
    lparams = add_lora(params, cfg, lcfg, jax.random.PRNGKey(1))
    lora_cfg = apply_lora_config(cfg, lcfg)
    mask = lora_filter(lparams)
    lopt = make_optimizer(lr=1e-4, params=lparams, trainable_mask=mask)
    lstep = make_train_step(lora_cfg, lopt, trainable_filter=mask)
    lora = _xla_flops(lstep, lparams, lopt.init(lparams), batch)

    a_full = F.dual_ar_train_step_flops(cfg, b, t, "full")["total"]
    a_lora = F.dual_ar_train_step_flops(cfg, b, t, "lora")["total"]
    # the analytic model drops ALL frozen dW GEMMs and counts NO adapter
    # GEMMs; at this deliberately tiny scale r=8 is 3% of dim=256, so the
    # uncounted adapter fwd+bwd work is a real fraction of the step
    # (measured ratio 0.82 vs analytic 0.68) — at flagship scale
    # (r=16, dim=2560) the same terms are <1%. Pin direction + magnitude.
    assert lora < full
    assert abs((lora / full) - (a_lora / a_full)) < 0.2, (
        lora / full, a_lora / a_full)


def test_dac_encode_flops_match_xla():
    from fish_speech_tpu.models.dac.model import dac_encode, init_dac

    cfg = DACConfig(encoder_transformer_layers=(0, 0, 0, 1))
    params = init_dac(jax.random.PRNGKey(0), cfg)
    samples = cfg.frame_length * 4
    audio = jnp.zeros((1, 1, samples), jnp.float32)

    measured = _xla_flops(
        lambda p, a: dac_encode(p, cfg, a)[0], params, audio)
    analytic = F.dac_encode_flops(cfg, 1, samples)
    assert 0.9 < measured / analytic < 1.3, (measured, analytic)


def test_dac_decode_flops_sanity():
    from fish_speech_tpu.models.dac.model import dac_from_indices, init_dac

    cfg = DACConfig()
    params = init_dac(jax.random.PRNGKey(0), cfg)
    frames = 4
    codes = jnp.zeros((1, 1 + cfg.rvq.n_codebooks, frames), jnp.int32)

    measured = _xla_flops(
        lambda p, c: dac_from_indices(p, cfg, c), params, codes)
    analytic = F.dac_decode_flops(cfg, 1, frames)
    # XLA's conv cost model normalizes out the conv_transpose input
    # dilation (measured ratio 0.984 — the small deficit is the causal
    # crop of the k-stride tail positions my per-input count includes)
    assert 0.9 < measured / analytic < 1.1, (measured, analytic)


def test_prefill_and_decode_flops_scale(one_layer_cfg):
    """Shape sanity for the serving-path helpers: prefill scales with
    rows*bucket; a decode step is ~1/bucket of a prefill per row."""
    cfg = one_layer_cfg
    p1 = F.dual_ar_prefill_flops(cfg, 1, 128)
    p16 = F.dual_ar_prefill_flops(cfg, 16, 128)
    assert p16 / p1 == pytest.approx(16.0)  # everything scales per row
    d = F.dual_ar_decode_step_flops(cfg, 16, kv_len=256.0)
    assert d < p16
