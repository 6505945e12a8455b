"""Fused int8 SwiGLU-FFN Pallas kernel, v2: CHUNK-CONTIGUOUS weight layout.

v1 streamed (D, chunk) slices of row-major (D, I) weights — 512-byte
contiguous runs per DMA row burst -> 350 GB/s. v2 pre-packs weights as
(I/chunk, D, chunk) / (I/chunk, chunk, D) so every grid step's block is one
contiguous 1.3 MB region.
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from fish_speech_tpu.ops.quant import mm


def _ffn_kernel(x_ref, w1_ref, s1_ref, w3_ref, s3_ref, w2_ref, s2_ref,
                o_ref, acc_ref):
    j = pl.program_id(0)
    x = x_ref[:]
    u1 = jnp.dot(x, w1_ref[0].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    u1 = u1 * s1_ref[:].astype(jnp.float32)
    u3 = jnp.dot(x, w3_ref[0].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    u3 = u3 * s3_ref[:].astype(jnp.float32)
    g = (u1 * jax.nn.sigmoid(u1) * u3).astype(jnp.bfloat16)
    part = jnp.dot(g, w2_ref[0].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s2_ref[:].astype(jnp.float32)).astype(
            o_ref.dtype)


@jax.jit
def ffn_fused(x, w1p, s1, w3p, s3, w2p, s2):
    """x (1, D); w1p/w3p (nc, D, C) int8; w2p (nc, C, D) int8;
    s1/s3 (1, nc*C); s2 (1, D)."""
    nc, d, c = w1p.shape
    m = x.shape[0]
    return pl.pallas_call(
        _ffn_kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((m, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, d), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, d), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, d), jnp.float32)],
    )(x, w1p, s1, w3p, s3, w2p, s2)


@functools.partial(jax.jit, static_argnums=1)
def _mk(key, shape):
    return jax.random.randint(key, shape, -127, 128, jnp.int8)


def bench(fn, x, iters=20):
    jax.device_get(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def make(L, D, I, C):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    nc = I // C
    return {
        "w1": {"q": _mk(ks[0], (L, D, I)), "s": jnp.full((L, 1, I), 1e-2, jnp.float32)},
        "w3": {"q": _mk(ks[1], (L, D, I)), "s": jnp.full((L, 1, I), 1e-2, jnp.float32)},
        "w2": {"q": _mk(ks[2], (L, I, D)), "s": jnp.full((L, 1, D), 1e-2, jnp.float32)},
    }


@functools.partial(jax.jit, static_argnames=("c",))
def pack(w, c):
    """(L,D,I),(L,I,D) int8 stacks -> chunk-contiguous."""
    L, D, I = w["w1"]["q"].shape
    nc = I // c
    def p13(q):  # (L, D, I) -> (L, nc, D, c)
        return q.reshape(L, D, nc, c).transpose(0, 2, 1, 3)
    def p2(q):   # (L, I, D) -> (L, nc, c, D)
        return q.reshape(L, nc, c, D)
    return {
        "w1p": p13(w["w1"]["q"]), "s1": w["w1"]["s"],
        "w3p": p13(w["w3"]["q"]), "s3": w["w3"]["s"],
        "w2p": p2(w["w2"]["q"]), "s2": w["w2"]["s"],
    }


def check(D=256, I=512, C=256):
    w = make(1, D, I, C)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, D), jnp.bfloat16)
    l = jax.tree.map(lambda a: a[0], w)
    ref = mm(jax.nn.silu(mm(x, {"q": l["w1"]["q"], "s": l["w1"]["s"][0]})) *
             mm(x, {"q": l["w3"]["q"], "s": l["w3"]["s"][0]}),
             {"q": l["w2"]["q"], "s": l["w2"]["s"][0]})
    p = jax.tree.map(lambda a: a[0], pack(w, C))
    got = ffn_fused(x, p["w1p"], p["s1"], p["w3p"], p["s3"], p["w2p"], p["s2"])
    ref = ref.astype(jnp.float32); got = got.astype(jnp.float32)
    rel = jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9)
    print(f"correctness max rel err: {float(rel):.2e}", flush=True)


def run(name, L, D, I, reps, C):
    x = jnp.ones((1, 1, D), jnp.bfloat16)
    w = make(L, D, I, C)
    wp = pack(w, C)

    @jax.jit
    def f_xla(x, w):
        def outer(c, _):
            def body(c, lp):
                u1 = mm(c, {"q": lp["w1"]["q"], "s": lp["w1"]["s"][0]})
                u3 = mm(c, {"q": lp["w3"]["q"], "s": lp["w3"]["s"][0]})
                return (c + mm(jax.nn.silu(u1) * u3,
                               {"q": lp["w2"]["q"], "s": lp["w2"]["s"][0]})
                        ).astype(c.dtype), None
            c, _ = lax.scan(body, c, w)
            return c * 0.5, None
        c, _ = lax.scan(outer, x, None, length=reps)
        return c

    @jax.jit
    def f_pl(x, wp):
        def outer(c, _):
            def body(c, lp):
                y = ffn_fused(c[0], lp["w1p"], lp["s1"], lp["w3p"], lp["s3"],
                              lp["w2p"], lp["s2"])
                return (c + y[None]).astype(c.dtype), None
            c, _ = lax.scan(body, c, wp)
            return c * 0.5, None
        c, _ = lax.scan(outer, x, None, length=reps)
        return c

    gb = L * (2 * D * I + I * D) / 1e9
    tx = bench(lambda x: f_xla(x, w), x) / reps
    tp = bench(lambda x: f_pl(x, wp), x) / reps
    print(f"{name} (chunk {C}): XLA {tx*1e3:.3f} ms ({gb/tx:.0f} GB/s)  "
          f"fused-Pallas {tp*1e3:.3f} ms ({gb/tp:.0f} GB/s)", flush=True)


print("devices:", jax.devices(), flush=True)
check()
run("slow FFN 36L 2560x9728", 36, 2560, 9728, 4, 512)
run("fast FFN 12L 1536x6144", 12, 1536, 6144, 10, 512)
run("fast FFN 12L 1536x6144", 12, 1536, 6144, 10, 1024)
