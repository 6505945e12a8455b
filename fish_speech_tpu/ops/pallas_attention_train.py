"""Pallas TPU kernels: TRAINING self-attention (forward + backward), GQA.

The teacher-forced training forward (`dual_ar._block_train`) is causal
self-attention with an optional key-padding mask. XLA's einsum path
materializes the (B, Hkv, G, T, T) fp32 score tensor in HBM three times
per layer per step (forward, remat recompute, backward) — measured
212 ms/step of pure score-tensor traffic on the flagship finetune
(b2 x t1024 on one v5e). These kernels keep scores in VMEM:

- forward: per (batch, q-head, q-block) grid cell, the head's full K/V
  is VMEM-resident; emits the output block AND the per-row logsumexp
  (the flash residual — O(B*H*T) instead of O(B*H*T^2)).
- backward: same tiling; recomputes the probability block from q,k and
  the saved logsumexp, then accumulates dK/dV across query blocks and
  across the G query heads of each KV group by REVISITING the same
  output block (the block index map ignores the q-block/group grid
  coordinates, so Mosaic keeps the fp32 accumulator in VMEM and flushes
  it once per KV head).

Gradient semantics match `ops.attention.gqa_attention` with the
causal & key-valid mask: masked positions get probability
exp(NEG_INF - lse) = 0, so their score gradient vanishes identically,
and fully-masked rows (only possible for padded QUERY positions, which
receive zero cotangent from the loss) contribute nothing either way.

Reference behavior being replaced: torch SDPA in the reference trainer
(`llama.py` attention with is_causal/key padding); this file is a
TPU-first re-design, not a port.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pick_block_q(t: int) -> int:
    block_q = min(t, 256)
    while t % block_q:
        block_q //= 2
    return block_q


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(kvalid_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                block_q: int, scale: float):
    i = pl.program_id(2)
    q = q_ref[0, 0]  # (BQ, D)
    k = k_ref[0, 0]  # (T, D)
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, T) fp32, VMEM-only

    t = k.shape[0]
    q_idx = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, t), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (block_q, t), 1)
    mask = (k_idx <= q_idx) & (kvalid_ref[0][None, :] > 0)
    s = jnp.where(mask, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / l).astype(v.dtype)
    o = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0]


def _fwd(q, k, v, kvalid, interpret: bool):
    """q (B,H,T,D), k/v (B,Hkv,T,D), kvalid (B,T) int32 -> o, lse(B,H,T)."""
    b, h, t, d = q.shape
    hkv = k.shape[1]
    g = h // hkv
    scale = 1.0 / math.sqrt(d)
    block_q = _pick_block_q(t)
    kernel = functools.partial(_fwd_kernel, block_q=block_q, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, t), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(b, h, t // block_q),
            in_specs=[
                pl.BlockSpec((1, t), lambda b_, h_, i_: (b_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q, d),
                             lambda b_, h_, i_: (b_, h_, i_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t, d),
                             lambda b_, h_, i_, g=g: (b_, h_ // g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t, d),
                             lambda b_, h_, i_, g=g: (b_, h_ // g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_q, d),
                             lambda b_, h_, i_: (b_, h_, i_, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q),
                             lambda b_, h_, i_: (b_, h_, i_),
                             memory_space=pltpu.VMEM),
            ),
        ),
        interpret=interpret,
    )(kvalid, q, k, v)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(kvalid_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dq_ref, dk_ref, dv_ref, *, block_q: int, scale: float,
                group: int):
    h = pl.program_id(1)
    i = pl.program_id(2)
    q = q_ref[0, 0]    # (BQ, D)
    k = k_ref[0, 0]    # (T, D)
    v = v_ref[0, 0]
    do = do_ref[0, 0]  # (BQ, D)
    lse = lse_ref[0, 0]      # (BQ,)
    delta = delta_ref[0, 0]  # (BQ,) = rowsum(dO * O)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, T)
    t = k.shape[0]
    q_idx = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, t), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (block_q, t), 1)
    mask = (k_idx <= q_idx) & (kvalid_ref[0][None, :] > 0)
    s = jnp.where(mask, s, NEG_INF)

    p = jnp.exp(s - lse[:, None])  # masked -> exp(NEG_INF - lse) = 0
    pb = p.astype(v.dtype)

    # dV += P^T dO ; dP = dO V^T ; dS = P * (dP - delta) * scale
    dv = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, T)
    ds = (p * (dp - delta[:, None]) * scale).astype(q.dtype)

    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, D)

    # fp32 accumulators revisited across the q-block sweep AND the `group`
    # consecutive query heads of this KV head (their block index is
    # identical, so the buffer stays in VMEM until the KV head changes)
    first = (h % group == 0) & (i == 0)

    @pl.when(first)
    def _():
        dk_ref[0, 0] = dk
        dv_ref[0, 0] = dv

    @pl.when(jnp.logical_not(first))
    def _():
        dk_ref[0, 0] += dk
        dv_ref[0, 0] += dv


def _bwd(q, k, v, kvalid, o, lse, do, interpret: bool):
    b, h, t, d = q.shape
    hkv = k.shape[1]
    g = h // hkv
    scale = 1.0 / math.sqrt(d)
    block_q = _pick_block_q(t)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    kernel = functools.partial(_bwd_kernel, block_q=block_q, scale=scale,
                               group=g)
    kv_spec = pl.BlockSpec((1, 1, t, d),
                           lambda b_, h_, i_, g=g: (b_, h_ // g, 0, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, 1, block_q, d),
                          lambda b_, h_, i_: (b_, h_, i_, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, block_q),
                            lambda b_, h_, i_: (b_, h_, i_),
                            memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(b, h, t // block_q),
            in_specs=[
                pl.BlockSpec((1, t), lambda b_, h_, i_: (b_, 0),
                             memory_space=pltpu.VMEM),
                q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec,
            ],
            out_specs=(q_spec, kv_spec, kv_spec),
        ),
        interpret=interpret,
    )(kvalid, q, k, v, do, lse, delta)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------------------------------
# custom_vjp wrapper in the model's (B, T, H, D) layout
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_train_attention(q, k, v, kvalid, interpret: bool = False):
    """Causal GQA self-attention with key-validity mask, trainable.

    Args:
      q: (B, T, H, D); k, v: (B, T, Hkv, D) with H % Hkv == 0.
      kvalid: (B, T) int32/bool — nonzero where the KEY position is real
        (i.e. `~pad_mask`). Query rows at invalid positions still produce
        (garbage) outputs; the loss masks them, so their cotangent is zero
        and gradients match the masked-einsum path exactly.
      interpret: run the Pallas kernels in interpreter mode (CPU tests).

    Returns (B, T, H, D) in q's dtype. T must be a multiple of 128.
    """
    o, _ = _fwd_t(q, k, v, kvalid, interpret)
    return o


def _fwd_t(q, k, v, kvalid, interpret):
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    o, lse = _fwd(qt, kt, vt, kvalid.astype(jnp.int32), interpret)
    return jnp.transpose(o, (0, 2, 1, 3)), (qt, kt, vt, o, lse)


def _flash_fwd_rule(q, k, v, kvalid, interpret):
    o, (qt, kt, vt, ot, lse) = _fwd_t(q, k, v, kvalid, interpret)
    return o, (qt, kt, vt, kvalid.astype(jnp.int32), ot, lse)


def _flash_bwd_rule(interpret, res, g):
    qt, kt, vt, kvalid, ot, lse = res
    gt = jnp.transpose(g, (0, 2, 1, 3)).astype(qt.dtype)
    dq, dk, dv = _bwd(qt, kt, vt, kvalid, ot, lse, gt, interpret)
    return (
        jnp.transpose(dq, (0, 2, 1, 3)),
        jnp.transpose(dk, (0, 2, 1, 3)),
        jnp.transpose(dv, (0, 2, 1, 3)),
        None,
    )


flash_train_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
