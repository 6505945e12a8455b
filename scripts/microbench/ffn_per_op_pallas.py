"""FFN-chain microbench: XLA mm vs Pallas int8 matvec, in the real
scan-over-layers decode structure (the one that reproduces in-model GB/s).
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from fish_speech_tpu.ops.quant import mm


def _kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("o_tile",))
def pl_mv(x, wq, s, o_tile=512):
    d, o = wq.shape
    m = x.shape[0]
    return pl.pallas_call(
        _kernel,
        grid=(o // o_tile,),
        in_specs=[
            pl.BlockSpec((m, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, o_tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o_tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, o_tile), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, o), jnp.bfloat16),
    )(x, wq, s)


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


def make(L, D, I):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return {
        "w1": {"q": _mk(ks[0], (L, D, I)), "s": jnp.full((L, I), 1e-2, jnp.float32)},
        "w3": {"q": _mk(ks[1], (L, D, I)), "s": jnp.full((L, I), 1e-2, jnp.float32)},
        "w2": {"q": _mk(ks[2], (L, I, D)), "s": jnp.full((L, D), 1e-2, jnp.float32)},
    }


def run(name, L, D, I, reps, o_tile):
    x = jnp.ones((1, 1, D), jnp.bfloat16)
    w = make(L, D, I)

    @jax.jit
    def f_xla(x, w):
        def outer(c, _):
            def body(c, lp):
                u1 = mm(c, lp["w1"]); u3 = mm(c, lp["w3"])
                return (c + mm(jax.nn.silu(u1) * u3, lp["w2"])).astype(c.dtype), None
            c, _ = lax.scan(body, c, w)
            return c * 0.5, None
        c, _ = lax.scan(outer, x, None, length=reps)
        return c

    @jax.jit
    def f_pl(x, w):
        def outer(c, _):
            def body(c, lp):
                c2 = c[0]  # (1, D)
                u1 = pl_mv(c2, lp["w1"]["q"], lp["w1"]["s"][None], o_tile=o_tile)
                u3 = pl_mv(c2, lp["w3"]["q"], lp["w3"]["s"][None], o_tile=o_tile)
                g = jax.nn.silu(u1.astype(jnp.float32)).astype(jnp.bfloat16) * u3
                y = pl_mv(g, lp["w2"]["q"], lp["w2"]["s"][None], o_tile=512)
                return (c + y[None]).astype(c.dtype), None
            c, _ = lax.scan(body, c, w)
            return c * 0.5, None
        c, _ = lax.scan(outer, x, None, length=reps)
        return c

    gb = L * (2 * D * I + I * D) / 1e9
    tx = bench(lambda x: f_xla(x, w), x) / reps
    tp = bench(lambda x: f_pl(x, w), x) / reps
    print(f"{name} (tile {o_tile}): XLA {tx*1e3:.3f} ms ({gb/tx:.0f} GB/s)  "
          f"Pallas {tp*1e3:.3f} ms ({gb/tp:.0f} GB/s)", flush=True)


print("devices:", jax.devices(), flush=True)
run("slow FFN 36L 2560x9728", 36, 2560, 9728, 4, 512)
run("fast FFN 12L 1536x6144", 12, 1536, 6144, 10, 512)
run("slow FFN 36L 2560x9728", 36, 2560, 9728, 4, 2432)
run("fast FFN 12L 1536x6144", 12, 1536, 6144, 10, 1024)
