"""Pallas TPU kernel (EXPERIMENTAL): single-token decode attention over the
KV cache with DYNAMIC length — reads only the valid cache prefix (rounded to
a block), so neither the static kv-prefix buckets (one recompile each) nor
full-cache reads are needed.

Status: semantics verified against the jnp reference in interpret mode
(tests/test_pallas_decode.py) AND bit-checked on real TPU; compiles fine at
flagship shapes (L=36,B=8,S=4128,Hkv=8,D=128: 1.5-4.7s). Measured on v5e vs
the production bucketed-einsum attention (per layer-step, B=8):
  len  200: flash 103us vs einsum(bucket  512) 102us  (wash)
  len 1800: flash 374us vs einsum(bucket 2048) 174us  (2.2x slower)
  len 4000: flash 676us vs einsum(bucket 4128) 262us  (2.6x slower)
block_s=512 is slightly worse (726us @ len 4000); block_s=1024 exceeds the
16MB scoped-VMEM limit. Root cause: the (B,) grid serializes batch rows on
the single v5e core and each block's compute (Hkv x Gp x block matmuls) is
too small to hide the DMA latency, while XLA's fused attention streams the
whole bucket at full HBM bandwidth. Production decode therefore stays on
bucketed einsum attention (models/dual_ar.py:_run_stack_decode); this kernel
is kept as a verified reference point — it would win on multi-core chips
(grid parallelism) or much longer contexts where bucket overshoot dominates.

The stacked cache stays in HBM (memory_space=ANY); the kernel double-buffers
(block, Hkv, D) DMAs and runs an online softmax for all heads of one batch
row per grid cell. Mosaic note: the cache's last two dims carry the (8,128)
tiling, so DMA slices must span the full (Hkv, D) trailing dims — hence
whole-head-block transfers and a batched GQA dot inside the kernel.

Layout contract:
  q:        (B, Hkv, Gp, D) — G query heads per kv head, padded to Gp>=8
  k_all/v_all: (L, B, S, Hkv, D) — full stacked cache, HBM-resident
  scalars:  int32[1 + B] = [layer, len_0, ..., len_{B-1}]
Returns (B, Hkv, Gp, D); callers slice the first G query rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(scalars, q_ref, k_hbm, v_hbm, o_ref, k_buf, v_buf, sem_k,
                   sem_v, *, block_s: int, scale: float):
    b = pl.program_id(0)
    layer = scalars[0]
    length = scalars[1 + b]
    s_total = k_hbm.shape[2]
    n_blocks = pl.cdiv(length, block_s)

    q = q_ref[0].astype(jnp.float32)  # (Hkv, Gp, D)
    hkv, gp, d = q.shape

    def start_of(i):
        # clamp the final block so the DMA stays in bounds even when the
        # cache length is not a block multiple
        return jnp.minimum(i * block_s, s_total - block_s)

    def copy_k(slot, i):
        return pltpu.make_async_copy(
            k_hbm.at[layer, b, pl.ds(start_of(i), block_s)], k_buf.at[slot],
            sem_k.at[slot],
        )

    def copy_v(slot, i):
        return pltpu.make_async_copy(
            v_hbm.at[layer, b, pl.ds(start_of(i), block_s)], v_buf.at[slot],
            sem_v.at[slot],
        )

    copy_k(0, 0).start()
    copy_v(0, 0).start()

    def body(i, carry):
        m, l, acc = carry
        slot = i % 2

        @pl.when(i + 1 < n_blocks)
        def _():
            copy_k((i + 1) % 2, i + 1).start()
            copy_v((i + 1) % 2, i + 1).start()

        copy_k(slot, i).wait()
        copy_v(slot, i).wait()
        # Mosaic batched dots need batch dims at equal positions: relayout
        # the block to (Hkv, BS, D)
        k = jnp.swapaxes(k_buf[slot], 0, 1).astype(jnp.float32)
        v = jnp.swapaxes(v_buf[slot], 0, 1).astype(jnp.float32)

        # batched GQA scores: contract D, batch over kv heads
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (Hkv, Gp, BS)
        key_pos = start_of(i) + jax.lax.broadcasted_iota(
            jnp.int32, (hkv, gp, block_s), 2
        )
        s = jnp.where(key_pos < length, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # (Hkv, Gp, BS) x (Hkv, BS, D) -> (Hkv, Gp, D), batch over kv heads
        pv = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * alpha + pv

    m0 = jnp.full((hkv, gp, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((hkv, gp, 1), jnp.float32)
    acc0 = jnp.zeros((hkv, gp, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_s", "interpret")
)
def flash_decode_attention(q, k_all, v_all, layer, lengths, block_s: int = 256,
                           interpret: bool = False):
    """q (B, Hkv, Gp, D) single-position queries; k_all/v_all the full
    (L, B, S, Hkv, D) cache; layer scalar int32; lengths (B,) int32 =
    visible prefix per row (pos + 1). Returns (B, Hkv, Gp, D)."""
    b, hkv, gp, d = q.shape
    s_total = k_all.shape[2]
    block_s = min(block_s, s_total)
    import math

    scale = 1.0 / math.sqrt(d)
    scalars = jnp.concatenate(
        [jnp.asarray([layer], jnp.int32).reshape(1), lengths.astype(jnp.int32)]
    )

    kernel = functools.partial(_decode_kernel, block_s=block_s, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec(
                    (1, hkv, gp, d), lambda b_, sc: (b_, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),  # k_all stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # v_all
            ],
            out_specs=pl.BlockSpec(
                (1, hkv, gp, d), lambda b_, sc: (b_, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, block_s, hkv, d), k_all.dtype),
                pltpu.VMEM((2, block_s, hkv, d), v_all.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(scalars, q, k_all, v_all)


def flash_decode_reference(q, k_all, v_all, layer, lengths):
    """jnp reference of the kernel semantics (tests/fallback)."""
    b, hkv, gp, d = q.shape
    k = k_all[layer]  # (B, S, Hkv, D)
    v = v_all[layer]
    s = jnp.einsum(
        "bkgd,bskd->bkgs", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / jnp.sqrt(jnp.float32(d))
    j = jnp.arange(k.shape[1])
    mask = j[None, :] < lengths[:, None]  # (B, S)
    s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    w = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bkgs,bskd->bkgd", w, v.astype(jnp.float32))
    return out.astype(q.dtype)
