"""Prototype: Pallas int8 matvec (weight-streaming) vs XLA at decode shapes.

At B=1 decode every matmul is a matvec bound by weight DMA. XLA measures
500-650 GB/s (61-79% of v5e's 819 GB/s). A Pallas kernel with grid-
pipelined weight blocks may stream closer to peak.

Scans over L DISTINCT layers so weights never stay VMEM-resident.
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("o_tile",))
def pallas_matvec(x, wq, s, o_tile=512):
    d, o = wq.shape
    m = x.shape[0]
    grid = (o // o_tile,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
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


def bench(fn, x, iters=30):
    jax.device_get(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def run(name, L, D, O, o_tile):
    q = _mk(jax.random.PRNGKey(0), (L, D, O))
    s = jnp.full((L, 1, O), 1e-2, jnp.float32)
    x = jnp.ones((1, D), jnp.bfloat16)

    @jax.jit
    def f_xla(x, q, s):
        def body(c, lp):
            y = (c @ lp[0].astype(jnp.bfloat16)) * lp[1][0].astype(jnp.bfloat16)
            return (y[:, :D] + c if O >= D else
                    jnp.pad(y, ((0, 0), (0, D - O))) + c), y
        c, ys = lax.scan(body, x, (q, s))
        return ys

    @jax.jit
    def f_pl(x, q, s):
        def body(c, lp):
            y = pallas_matvec(c, lp[0], lp[1], o_tile=o_tile)
            return (y[:, :D] + c if O >= D else
                    jnp.pad(y, ((0, 0), (0, D - O))) + c), y
        c, ys = lax.scan(body, x, (q, s))
        return ys

    gb = L * D * O / 1e9
    tx = bench(lambda x: f_xla(x, q, s), x)
    tp = bench(lambda x: f_pl(x, q, s), x)
    print(f"{name} (L={L} {D}x{O}, tile {o_tile}): "
          f"XLA {tx*1e3:.3f} ms ({gb/tx:.0f} GB/s)  "
          f"Pallas {tp*1e3:.3f} ms ({gb/tp:.0f} GB/s)", flush=True)


print("devices:", jax.devices(), flush=True)
# slow-stack shapes (36 layers)
run("slow w13", 36, 2560, 19456, 512)
run("slow w2 ", 36, 9728, 2560, 512)
run("slow qkv", 36, 2560, 6144, 512)
run("slow wo ", 36, 4096, 2560, 512)
# fast-stack shapes (12 layers)
run("fast w13", 12, 1536, 12288, 512)
run("fast w2 ", 12, 6144, 1536, 512)
run("fast qkv", 12, 1536, 2560, 512)
run("fast wo ", 12, 1536, 1536, 512)
