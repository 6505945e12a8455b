"""Pallas TPU kernel: prefill self-attention (causal + per-row start
offset), GQA-aware.

XLA's einsum attention materializes the full (B, H, T, T) fp32 score tensor
(2+ GB at 4k context); this kernel tiles queries and keeps each head's K/V
resident in VMEM, so scores never leave the chip. Per grid cell
(batch, q-head, q-block): q (BQ, D) + K/V (T, D) + scores (BQ, T) ≈ 7 MB
VMEM at T=4096.

Mask semantics match `dual_ar.prefill`: key j visible to query i iff
j <= i and j >= offset_b (left-aligned prompts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _prefill_kernel(off_ref, q_ref, k_ref, v_ref, o_ref, *, block_q: int,
                    scale: float):
    b = pl.program_id(0)
    i = pl.program_id(2)
    q = q_ref[0, 0]  # (BQ, D)
    k = k_ref[0, 0]  # (T, D)
    v = v_ref[0, 0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, T)

    t = k.shape[0]
    q_idx = i * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, t), 0
    )
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (block_q, t), 1)
    offset = off_ref[b]
    mask = (k_idx <= q_idx) & (k_idx >= offset)
    scores = jnp.where(mask, scores, NEG_INF)

    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        weights, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_prefill_attention(q, k, v, offsets, interpret: bool = False):
    """q (B, T, H, D), k/v (B, T, Hkv, D), offsets (B,) int32 -> (B, T, H, D).

    Causal with per-row key start offsets. T must be a multiple of the
    query block (padded prompts already are — buckets are powers of two).
    """
    b, t, h, d = q.shape
    hkv = k.shape[2]
    g = h // hkv
    import math

    scale = 1.0 / math.sqrt(d)
    block_q = min(t, 256)
    while t % block_q:
        block_q //= 2

    # Mosaic requires the last two block dims to tile (8, 128) or span the
    # array, so heads move to a leading axis: (B, H, T, D).
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))

    kernel = functools.partial(_prefill_kernel, block_q=block_q, scale=scale)
    grid = (b, h, t // block_q)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # offsets, indexable in index_maps
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, d),
                    lambda b_, h_, i_, off: (b_, h_, i_, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, t, d),
                    lambda b_, h_, i_, off, g=g: (b_, h_ // g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, t, d),
                    lambda b_, h_, i_, off, g=g: (b_, h_ // g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, d),
                lambda b_, h_, i_, off: (b_, h_, i_, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
    )(offsets.astype(jnp.int32), qt, kt, vt)
    return jnp.transpose(out, (0, 2, 1, 3))
