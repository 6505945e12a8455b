"""Microbench: fused w13 vs split w1/w3 FFN matmuls at real decode shapes.

Scans over L DISTINCT int8 layers (like the model's stacked-layer scan), so
weights stream from HBM each iteration — no VMEM-residency artifact.
int8 weights are created directly on device (no fp32 tunnel traffic).
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
from jax import lax
from fish_speech_tpu.ops.quant import mm

def bench(fn, x, iters=20):
    jax.device_get(fn(x))  # block_until_ready doesn't sync through axon
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters

from functools import partial

@partial(jax.jit, static_argnums=1)
def _mk(key, shape):
    return jax.random.randint(key, shape, -127, 128, jnp.int8)

def make(L, D, I):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q1 = _mk(ks[0], (L, D, I)); q3 = _mk(ks[1], (L, D, I))
    q2 = _mk(ks[2], (L, I, D))
    s1 = jnp.full((L, I), 1e-2, jnp.float32)
    s2 = jnp.full((L, D), 1e-2, jnp.float32)
    split = {"w1": {"q": q1, "s": s1}, "w3": {"q": q3, "s": s1},
             "w2": {"q": q2, "s": s2}}
    fused = {"w13": {"q": jnp.concatenate([q1, q3], axis=-1),
                     "s": jnp.concatenate([s1, s1], axis=-1)},
             "w2": {"q": q2, "s": s2}}
    return split, fused

def run(name, L, D, I, B, reps):
    x = jnp.ones((B, 1, D), jnp.bfloat16)
    split, fused = make(L, D, I)

    @jax.jit
    def f_split(x, w):
        def outer(c, _):
            def body(c, lp):
                u1 = mm(c, lp["w1"]); u3 = mm(c, lp["w3"])
                return (c + mm(jax.nn.silu(u1) * u3, lp["w2"])).astype(c.dtype), None
            c, _ = lax.scan(body, c, w)
            return c * 0.5, None
        c, _ = lax.scan(outer, x, None, length=reps)
        return c

    @jax.jit
    def f_fused(x, w):
        def outer(c, _):
            def body(c, lp):
                u = mm(c, lp["w13"])
                u1, u3 = u[..., :I], u[..., I:]
                return (c + mm(jax.nn.silu(u1) * u3, lp["w2"])).astype(c.dtype), None
            c, _ = lax.scan(body, c, w)
            return c * 0.5, None
        c, _ = lax.scan(outer, x, None, length=reps)
        return c

    ts = bench(lambda x: f_split(x, split), x) / reps
    tf = bench(lambda x: f_fused(x, fused), x) / reps
    gb = L * (2 * D * I + I * D) / 1e9  # int8 bytes per pass
    print(f"{name}: split {ts*1e3:.3f} ms ({gb/ts:.0f} GB/s)  "
          f"fused {tf*1e3:.3f} ms ({gb/tf:.0f} GB/s)  "
          f"delta {(ts-tf)*1e3:+.3f} ms/pass", flush=True)
    return ts, tf

print("devices:", jax.devices(), flush=True)
s = run("slow (36L 2560x9728, B=1)", 36, 2560, 9728, 1, 4)
f = run("fast (12L 1536x6144, B=1)", 12, 1536, 6144, 1, 10)
print(f"per-frame FFN delta (slow x1 + fast x10): "
      f"{((s[0]-s[1]) + (f[0]-f[1])*10)*1e3:+.3f} ms", flush=True)
