import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.ops.quant import (
    _int4_effective_weight,
    mm,
    quantize_dual_ar,
    quantize_int4,
)


def test_int4_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32) * 0.1)
    qw = quantize_int4(w, group_size=64)
    assert qw["p"].shape == (128, 64) and qw["p"].dtype == jnp.uint8
    assert qw["gs"].shape == (4, 64)
    deq = np.asarray(_int4_effective_weight(qw, jnp.float32))
    # int4 groupwise: error bounded by half a scale step per group
    gs = np.repeat(np.asarray(qw["gs"]), 64, axis=0)
    assert (np.abs(deq - np.asarray(w)) <= gs * 0.51 + 1e-8).all()


def test_int4_mm_close_to_dense():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32) * 0.05)
    dense = np.asarray(x @ w)
    got = np.asarray(mm(x, quantize_int4(w, group_size=64)))
    # 4-bit noise accumulates over the contraction: for i.i.d. N(0,1) inputs
    # the expected error ratio is ~ (scale/sqrt(12)) * sqrt(I) / E|dense|
    # ~ 0.18 for these shapes; random weights are the worst case (no
    # structure to absorb). Bound loosely; quality on real checkpoints is
    # the real gate.
    max_rel = np.abs(dense - got).max() / np.abs(dense).max()
    mean_rel = np.abs(dense - got).mean() / np.abs(dense).mean()
    assert max_rel < 0.3, max_rel
    assert mean_rel < 0.2, mean_rel


def test_int4_stacked_layers():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(3, 64, 32)).astype(np.float32) * 0.1)
    qw = quantize_int4(w, group_size=32)
    assert qw["p"].shape == (3, 32, 32)
    x = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32))
    for i in range(3):
        got = np.asarray(mm(x, {"p": qw["p"][i], "gs": qw["gs"][i]}))
        want = np.asarray(x @ w[i])
        assert np.abs(got - want).max() / np.abs(want).max() < 0.15


def test_int4_model_forward():
    from fish_speech_tpu.config import dual_ar_tiny
    from fish_speech_tpu.models import dual_ar

    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3)
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_dual_ar(params, mode="int4", group_size=32)
    assert qparams["layers"]["wqkv"]["p"].dtype == jnp.uint8

    rng = np.random.default_rng(0)
    inp = np.zeros((1, cfg.num_codebooks + 1, 8), dtype=np.int32)
    inp[0, 0] = rng.integers(4, 200, size=8)
    l_f, _ = dual_ar.forward_train(params, cfg, jnp.asarray(inp), remat=False)
    l_q, _ = dual_ar.forward_train(qparams, cfg, jnp.asarray(inp), remat=False)
    denom = np.abs(np.asarray(l_f)).max()
    assert np.abs(np.asarray(l_f) - np.asarray(l_q)).max() / denom < 0.15
