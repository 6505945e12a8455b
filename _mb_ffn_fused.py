"""Fused int8 SwiGLU-FFN Pallas kernel: w1+w3+silu+w2 in ONE kernel.

Grid over I-chunks; Mosaic auto-double-buffers the three weight streams
(w1[:, chunk], w3[:, chunk], w2[chunk, :]); partial y accumulates in a
VMEM scratch, scaled + written out on the last chunk. Zero intermediate
HBM traffic; one kernel per FFN instead of three matmuls.
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
    u1 = jnp.dot(x, w1_ref[:].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    u1 = u1 * s1_ref[:].astype(jnp.float32)
    u3 = jnp.dot(x, w3_ref[:].astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    u3 = u3 * s3_ref[:].astype(jnp.float32)
    g = (u1 * jax.nn.sigmoid(u1) * u3).astype(jnp.bfloat16)
    part = jnp.dot(g, w2_ref[:].astype(jnp.bfloat16),
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


@functools.partial(jax.jit, static_argnames=("i_chunk",))
def ffn_fused(x, w1, s1, w3, s3, w2, s2, i_chunk=512):
    d, i = w1.shape
    m = x.shape[0]
    return pl.pallas_call(
        _ffn_kernel,
        grid=(i // i_chunk,),
        in_specs=[
            pl.BlockSpec((m, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, i_chunk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i_chunk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, i_chunk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i_chunk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((i_chunk, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, d), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, d), jnp.float32)],
    )(x, w1, s1, w3, s3, w2, s2)


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
        "w1": {"q": _mk(ks[0], (L, D, I)), "s": jnp.full((L, 1, I), 1e-2, jnp.float32)},
        "w3": {"q": _mk(ks[1], (L, D, I)), "s": jnp.full((L, 1, I), 1e-2, jnp.float32)},
        "w2": {"q": _mk(ks[2], (L, I, D)), "s": jnp.full((L, 1, D), 1e-2, jnp.float32)},
    }


def check(D=256, I=512):
    w = make(1, D, I)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, D), jnp.bfloat16)
    l = jax.tree.map(lambda a: a[0], w)
    ref = mm(jax.nn.silu(mm(x, {"q": l["w1"]["q"], "s": l["w1"]["s"][0]})) *
             mm(x, {"q": l["w3"]["q"], "s": l["w3"]["s"][0]}),
             {"q": l["w2"]["q"], "s": l["w2"]["s"][0]})
    got = ffn_fused(x, l["w1"]["q"], l["w1"]["s"], l["w3"]["q"], l["w3"]["s"],
                    l["w2"]["q"], l["w2"]["s"], i_chunk=256)
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    print("correctness max|err|:", float(err), flush=True)


def run(name, L, D, I, reps, i_chunk):
    x = jnp.ones((1, 1, D), jnp.bfloat16)
    w = make(L, D, I)

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
    def f_pl(x, w):
        def outer(c, _):
            def body(c, lp):
                y = ffn_fused(c[0], lp["w1"]["q"], lp["w1"]["s"],
                              lp["w3"]["q"], lp["w3"]["s"],
                              lp["w2"]["q"], lp["w2"]["s"], i_chunk=i_chunk)
                return (c + y[None]).astype(c.dtype), None
            c, _ = lax.scan(body, c, w)
            return c * 0.5, None
        c, _ = lax.scan(outer, x, None, length=reps)
        return c

    gb = L * (2 * D * I + I * D) / 1e9
    tx = bench(lambda x: f_xla(x, w), x) / reps
    tp = bench(lambda x: f_pl(x, w), x) / reps
    print(f"{name} (chunk {i_chunk}): XLA {tx*1e3:.3f} ms ({gb/tx:.0f} GB/s)  "
          f"fused-Pallas {tp*1e3:.3f} ms ({gb/tp:.0f} GB/s)", flush=True)


print("devices:", jax.devices(), flush=True)
check()
run("slow FFN 36L 2560x9728", 36, 2560, 9728, 4, 512)
run("fast FFN 12L 1536x6144", 12, 1536, 6144, 10, 512)
run("slow FFN 36L 2560x9728", 36, 2560, 9728, 4, 2432)
run("fast FFN 12L 1536x6144", 12, 1536, 6144, 10, 1024)
