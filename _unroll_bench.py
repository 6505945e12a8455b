"""Does fori_loop + dynamic weight indexing cost extra HBM traffic vs a
statically unrolled layer loop? Flagship slow stack, int8, batch 8."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fish_speech_tpu.config import dual_ar_s2_pro
from fish_speech_tpu.models import dual_ar
from fish_speech_tpu.models.dual_ar import (
    _layer_slice, _qkv, _attn_out, _ffn, _slow_spec, apply_rope,
)
from fish_speech_tpu.ops.attention import gqa_attention
from fish_speech_tpu.ops.norms import rms_norm
from fish_speech_tpu.ops.quant import quantize_dual_ar_lowmem

cfg = dual_ar_s2_pro(semantic_begin_id=151000, semantic_end_id=155095,
                     im_end_id=150994).resolve()
B, KVLEN, STEPS = 8, 2048, 32
spec = _slow_spec(cfg)

params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
params = quantize_dual_ar_lowmem(params, mode="int8")
layers = params["layers"]
cache = {
    "k": jnp.zeros((cfg.n_layer, B, KVLEN, cfg.n_local_heads, cfg.head_dim),
                   jnp.bfloat16),
    "v": jnp.zeros((cfg.n_layer, B, KVLEN, cfg.n_local_heads, cfg.head_dim),
                   jnp.bfloat16),
}
jax.block_until_ready(cache)
print(f"# params quantized, n_layer={cfg.n_layer}", flush=True)


def one_layer(lp, x, freqs, kc_all, vc_all, i, pos, kv_mask):
    b = x.shape[0]
    h = rms_norm(x, lp["attn_norm"], spec[3])
    q, k, v = _qkv(lp, spec, h)
    q = apply_rope(q, freqs)
    k = apply_rope(k, freqs)
    kc_all = lax.dynamic_update_slice(
        kc_all, k[None].astype(kc_all.dtype), (i, 0, pos, 0, 0))
    vc_all = lax.dynamic_update_slice(
        vc_all, v[None].astype(vc_all.dtype), (i, 0, pos, 0, 0))
    kcl = lax.dynamic_slice(kc_all, (i, 0, 0, 0, 0),
                            (1, b, KVLEN) + kc_all.shape[3:])[0]
    vcl = lax.dynamic_slice(vc_all, (i, 0, 0, 0, 0),
                            (1, b, KVLEN) + vc_all.shape[3:])[0]
    y = gqa_attention(q, kcl, vcl, kv_mask)
    x = x + _attn_out(lp, spec, y.reshape(b, x.shape[1], -1))
    h2 = rms_norm(x, lp["ffn_norm"], spec[3])
    return x + _ffn(lp, spec, h2), kc_all, vc_all


def stack_fori(x, freqs, cache, pos, kv_mask):
    def body(i, carry):
        x, kc, vc = carry
        lp = _layer_slice(layers, i)
        return one_layer(lp, x, freqs, kc, vc, i, pos, kv_mask)
    x, kc, vc = lax.fori_loop(0, cfg.n_layer, body, (x, cache["k"], cache["v"]))
    return x, {"k": kc, "v": vc}


def stack_unrolled(x, freqs, cache, pos, kv_mask):
    kc, vc = cache["k"], cache["v"]
    for i in range(cfg.n_layer):
        lp = jax.tree_util.tree_map(lambda a: a[i], layers)
        x, kc, vc = one_layer(lp, x, freqs, kc, vc, i, pos, kv_mask)
    return x, {"k": kc, "v": vc}


def make_chunk(stack_fn):
    @jax.jit
    def chunk(x0, cache, pos0):
        table = dual_ar.precompute_rope(cfg.max_seq_len, cfg.head_dim,
                                        cfg.rope_base)
        def body(i, carry):
            x, cache = carry
            pos = pos0 + i
            freqs = lax.dynamic_slice(table, (pos, 0, 0),
                                      (1,) + table.shape[1:])
            j = jnp.arange(KVLEN)
            kv_mask = (j <= pos)[None, None, :]
            y, cache = stack_fn(x, freqs, cache, pos, kv_mask)
            # chain: feed output back (normalized) so steps are dependent
            return y / (jnp.linalg.norm(y) + 1.0), cache
        return lax.fori_loop(0, STEPS, body, (x0, cache))
    return chunk


x0 = jax.random.normal(jax.random.PRNGKey(1), (B, 1, cfg.dim), jnp.bfloat16)

for name, fn in (("fori", make_chunk(stack_fori)),
                 ("unrolled", make_chunk(stack_unrolled))):
    t0 = time.perf_counter()
    y, c2 = fn(x0, cache, jnp.int32(100))
    np.asarray(y)
    print(f"{name} compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for s in range(3):
        t0 = time.perf_counter()
        y, c2 = fn(x0 + (s + 1), cache, jnp.int32(100))
        np.asarray(y)
        times.append(time.perf_counter() - t0)
    per_step = min(times) / STEPS * 1000
    print(f"{name}: {per_step:.2f} ms/step ({min(times)*1000:.0f}ms/{STEPS})",
          flush=True)
