"""Tensor-parallel inference: generation with (dp=1, tp=2)-sharded params
and KV cache must produce the SAME tokens as unsharded (GSPMD inserts the
collectives; numerics identical up to fp reassociation, and sampling is
deterministic given the key)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # jit-compile heavy; fast tier skips with -m 'not heavy'
from jax.sharding import NamedSharding, PartitionSpec as P

from fish_speech_tpu.config import SamplingConfig, dual_ar_tiny
from fish_speech_tpu.generate import GenerationSession
from fish_speech_tpu.models import dual_ar
from fish_speech_tpu.parallel.mesh import (
    dual_ar_param_specs,
    kv_cache_specs,
    make_mesh,
    to_named,
)


@pytest.fixture(scope="module")
def setup():
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3,
        n_head=4, n_local_heads=2, head_dim=32, dim=128,
        intermediate_size=256,
        fast_n_head=2, fast_n_local_heads=2, fast_head_dim=16, fast_dim=64,
        fast_intermediate_size=128,
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def make_prompt(cfg, t=10):
    rng = np.random.default_rng(0)
    p = np.zeros((cfg.num_codebooks + 1, t), dtype=np.int32)
    p[0] = rng.integers(4, 200, size=t)
    return p


def test_tp_sharded_generation_matches(setup):
    cfg, params = setup
    prompt = make_prompt(cfg)

    ref_session = GenerationSession(
        params, cfg, SamplingConfig(), dtype=jnp.float32, decode_chunk_size=8
    )
    want = ref_session.generate(prompt, jax.random.PRNGKey(5), max_new_tokens=12)

    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)
    pspecs = to_named(mesh, dual_ar_param_specs(cfg))
    sharded_params = jax.tree_util.tree_map(jax.device_put, params, pspecs)

    session = GenerationSession(
        sharded_params, cfg, SamplingConfig(), dtype=jnp.float32,
        decode_chunk_size=8,
    )
    cspecs = to_named(mesh, kv_cache_specs())
    session.cache = jax.tree_util.tree_map(
        jax.device_put, session.cache, cspecs
    )

    got = session.generate(prompt, jax.random.PRNGKey(5), max_new_tokens=12)
    np.testing.assert_array_equal(got, want)


def test_tp_sharded_generation_matches_kv_quant(setup):
    """int8 KV cache x tensor parallelism: the quantized cache's scale
    leaves (ks/vs) get explicit specs (`mesh.kv_cache_specs(quant=True)`)
    so sharded int8-KV generation matches unsharded int8-KV generation."""
    cfg, params = setup
    prompt = make_prompt(cfg)

    ref_session = GenerationSession(
        params, cfg, SamplingConfig(), dtype=jnp.float32, decode_chunk_size=8,
        kv_quant=True,
    )
    want = ref_session.generate(prompt, jax.random.PRNGKey(5), max_new_tokens=12)

    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)
    pspecs = to_named(mesh, dual_ar_param_specs(cfg))
    sharded_params = jax.tree_util.tree_map(jax.device_put, params, pspecs)

    session = GenerationSession(
        sharded_params, cfg, SamplingConfig(), dtype=jnp.float32,
        decode_chunk_size=8, kv_quant=True,
    )
    cspecs = to_named(mesh, kv_cache_specs(quant=True))
    session.cache = jax.tree_util.tree_map(
        jax.device_put, session.cache, cspecs
    )

    got = session.generate(prompt, jax.random.PRNGKey(5), max_new_tokens=12)
    np.testing.assert_array_equal(got, want)


def test_tp_sharded_forward_matches(setup):
    cfg, params = setup
    rng = np.random.default_rng(1)
    inp = np.zeros((2, cfg.num_codebooks + 1, 12), dtype=np.int32)
    inp[:, 0] = rng.integers(4, 200, size=(2, 12))

    want_tok, want_cb = dual_ar.forward_train(
        params, cfg, jnp.asarray(inp), remat=False
    )

    mesh = make_mesh(jax.devices()[:4], dp=2, tp=2)
    pspecs = to_named(mesh, dual_ar_param_specs(cfg))
    sharded = jax.tree_util.tree_map(jax.device_put, params, pspecs)
    binp = jax.device_put(
        jnp.asarray(inp), NamedSharding(mesh, P("dp", None, None))
    )
    got_tok, got_cb = jax.jit(
        lambda p, x: dual_ar.forward_train(p, cfg, x, remat=False)
    )(sharded, binp)
    np.testing.assert_allclose(
        np.asarray(want_tok), np.asarray(got_tok), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(want_cb), np.asarray(got_cb), rtol=2e-4, atol=2e-4
    )
