"""int8 KV cache (`init_kv_cache(quant=True)`).

Contract:
- prefill logits are EXACT (prefill attends fresh bf16/f32 k/v; only the
  cache store is quantized);
- decode reads dequantized k/v whose per-vector error is bounded by the
  int8 grid (absmax/127 per (position, head));
- the continuous-batching write path (write_rows) preserves inactive rows
  and scatter_parked_rows moves scales with values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import SamplingConfig, dual_ar_tiny
from fish_speech_tpu.models import dual_ar


@pytest.fixture(scope="module")
def setup():
    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3)
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def _prompt(cfg, t, seed=42):
    rng = np.random.default_rng(seed)
    inp = np.zeros((cfg.num_codebooks + 1, t), dtype=np.int32)
    inp[0] = rng.integers(4, 200, size=t)
    return inp


def test_quant_roundtrip_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 3, 16), jnp.float32)
    q, s = dual_ar._kv_quant(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 5, 3)
    back = dual_ar._kv_dequant(q, s, jnp.float32)
    # error <= half a quantization step + bf16 scale rounding (2^-9 rel)
    step = np.asarray(s, np.float32)[..., None]
    bound = 0.51 * step + 2.0 ** -9 * np.abs(np.asarray(x)) + 1e-6
    assert (np.abs(np.asarray(back - x)) <= bound).all()


def test_prefill_logits_exact(setup):
    cfg, params = setup
    t = 12
    inp = jnp.asarray(_prompt(cfg, t)[None])
    offsets = jnp.zeros((1,), jnp.int32)
    c_ref = dual_ar.init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    c_q = dual_ar.init_kv_cache(cfg, 1, 32, dtype=jnp.float32, quant=True)
    l_ref, h_ref, c_ref = dual_ar.prefill(params, cfg, inp, c_ref, offsets,
                                          jnp.int32(t))
    l_q, h_q, c_q = dual_ar.prefill(params, cfg, inp, c_q, offsets,
                                    jnp.int32(t))
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_q))
    np.testing.assert_array_equal(np.asarray(h_ref), np.asarray(h_q))
    assert c_q["k"].dtype == jnp.int8 and c_q["ks"].dtype == jnp.bfloat16
    # stored values dequantize close to the exact cache
    k_back = dual_ar._kv_dequant(c_q["k"], c_q["ks"], jnp.float32)
    err = np.abs(np.asarray(k_back[:, :, :t]) - np.asarray(c_ref["k"][:, :, :t]))
    scale = np.abs(np.asarray(c_ref["k"][:, :, :t])).max()
    assert err.max() <= 0.02 * scale + 1e-6


def test_decode_close_to_exact(setup):
    cfg, params = setup
    t = 10
    inp = jnp.asarray(_prompt(cfg, t)[None])
    offsets = jnp.zeros((1,), jnp.int32)

    outs = {}
    for name, quant in (("ref", False), ("q", True)):
        cache = dual_ar.init_kv_cache(cfg, 1, 32, dtype=jnp.float32,
                                      quant=quant)
        _, hidden, cache = dual_ar.prefill(params, cfg, inp, cache, offsets,
                                           jnp.int32(t))
        hs = []
        tok = jnp.asarray(_prompt(cfg, 1, seed=7)[None][:, :, 0])
        for step in range(4):
            hidden, slow_out, cache = dual_ar.decode_slow_step(
                params, cfg, tok, cache, jnp.int32(t + step)
            )
            hs.append(np.asarray(slow_out))
        outs[name] = np.stack(hs)
    ref, q = outs["ref"], outs["q"]
    rel = np.abs(q - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, f"decode drifted {rel:.3f} from exact KV"


def test_multi_row_write_preserves_inactive(setup):
    cfg, params = setup
    b, s = 3, 16
    cache = dual_ar.init_kv_cache(cfg, b, s, dtype=jnp.float32, quant=True)
    tok = jnp.asarray(np.stack([_prompt(cfg, 1, seed=i)[:, 0]
                                for i in range(b)]))
    pos = jnp.asarray([2, 5, 9], jnp.int32)
    active = jnp.asarray([True, False, True])
    before_k = np.asarray(cache["k"])
    before_ks = np.asarray(cache["ks"])
    _, _, cache2 = dual_ar.decode_slow_step_multi(
        params, cfg, tok, cache, pos, active
    )
    after_k = np.asarray(cache2["k"])
    after_ks = np.asarray(cache2["ks"].astype(jnp.float32))
    # row 1 inactive -> untouched everywhere
    np.testing.assert_array_equal(after_k[:, 1], before_k[:, 1])
    np.testing.assert_array_equal(
        after_ks[:, 1], np.asarray(before_ks[:, 1], np.float32)
    )
    # rows 0/2 wrote their position (scales become nonzero)
    assert (after_ks[:, 0, 2] != 0).any()
    assert (after_ks[:, 2, 9] != 0).any()


def test_scatter_parked_rows_moves_scales(setup):
    from fish_speech_tpu.generate import scatter_parked_rows

    cfg, _ = setup
    pool = dual_ar.init_kv_cache(cfg, 4, 16, dtype=jnp.float32, quant=True)
    parked = dual_ar.init_kv_cache(cfg, 2, 8, dtype=jnp.float32, quant=True)
    parked = {
        "k": parked["k"].at[:].set(7),
        "v": parked["v"].at[:].set(3),
        "ks": parked["ks"].at[:].set(0.5),
        "vs": parked["vs"].at[:].set(0.25),
    }
    out = scatter_parked_rows(
        pool, parked,
        src_idx=jnp.asarray([0, 1, 0, 0], jnp.int32),
        rows=jnp.asarray([2, 0, 1, 3], jnp.int32),
        take=jnp.asarray([True, True, False, False]),
    )
    assert (np.asarray(out["k"][:, 2, :8]) == 7).all()
    assert (np.asarray(out["ks"][:, 0, :8].astype(jnp.float32)) == 0.5).all()
    assert (np.asarray(out["k"][:, 1]) == 0).all()  # take=False untouched
    assert (np.asarray(out["vs"][:, 3].astype(jnp.float32)) == 0).all()


def test_generate_end_to_end_kv_quant(setup):
    """Full session generate with kv_quant: valid constrained tokens out."""
    from fish_speech_tpu.generate import GenerationSession

    cfg, params = setup
    sess = GenerationSession(params, cfg, SamplingConfig(), max_batch=1,
                             dtype=jnp.float32, decode_chunk_size=4,
                             kv_quant=True)
    prompt = np.zeros((cfg.num_codebooks + 1, 8), dtype=np.int32)
    prompt[0] = np.arange(4, 12)
    seq = sess.generate(prompt, jax.random.PRNGKey(0), max_new_tokens=10)
    main = seq[0]
    ok = ((main >= cfg.semantic_begin_id) & (main <= cfg.semantic_end_id)) | (
        main == cfg.im_end_id
    )
    assert ok.all()


def test_gqa_attention_kv8_matches_dequant():
    """Folded-scale attention == dequantize-then-attend (same math)."""
    from fish_speech_tpu.ops.attention import gqa_attention, gqa_attention_kv8

    key = jax.random.PRNGKey(0)
    b, t, s, h, hkv, d = 2, 1, 9, 4, 2, 8
    q = jax.random.normal(key, (b, t, h, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, hkv, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, hkv, d), jnp.float32)
    kq, ks = dual_ar._kv_quant(k)
    vq, vs = dual_ar._kv_quant(v)
    mask = (np.arange(s) < 6)[None, None, :]
    ref = gqa_attention(q, dual_ar._kv_dequant(kq, ks, jnp.float32),
                        dual_ar._kv_dequant(vq, vs, jnp.float32),
                        jnp.asarray(mask))
    got = gqa_attention_kv8(q, kq, ks, vq, vs, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
