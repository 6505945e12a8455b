"""Pallas TPU kernel: int4 group-wise weight-only matmul.

y = x @ W where W is stored packed two-nibbles-per-byte (half-split layout,
see `quant.quantize_int4`): HBM traffic is the packed bytes + scales; the
unpack + dequant happens in VMEM/VPU and feeds the MXU directly — this is
what XLA's fusion declines to do (it materializes the unpacked weights,
making the pure-XLA int4 path slower than bf16).

Layout contract (per 2D weight):
  p:  (I/2, O) uint8 — low nibble = row i, high nibble = row i + I/2
  gs: (I/g, O) f32   — group scales over the ORIGINAL row index
Constraint: (I/2) % g == 0 so groups never straddle the half split.

Measured status (v5e, 4.96B model): SLOWER than int8 at every batch —
single stream AND 16-stream serving (586 f/s int4 / 682 mixed / 840 int8).
The ~5 VPU ops per weight element for the nibble unpack are the bottleneck
and do not amortize with batch (unpack cost is per weight tile, but the
VPU, not HBM, is the limiting engine once weights are int4). Kept as an
opt-in (`--quant int4|mixed`) for memory-constrained deployments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int4_mm_kernel(x_ref, p_ref, s_ref, o_ref, *, group: int):
    p = p_ref[:]  # (I/2, T) uint8
    half = p.shape[0]
    # Mosaic constraints: no i8 vector arithmetic, no uint8->bf16 cast.
    # Widen to int32 (supported), unpack + bias there, then cast to bf16.
    p32 = p.astype(jnp.int32)
    lo = ((p32 & 0xF) - 8).astype(jnp.bfloat16)
    hi = ((p32 >> 4) - 8).astype(jnp.bfloat16)

    s = s_ref[:]  # (I/g, T) f32
    n_half_groups = half // group
    tile = s.shape[-1]

    def expand(sg):
        # element-wise row repeat (g copies of each group row):
        # (G, T) -> (G, group, T) -> (G*group, T)
        g_rows = sg.shape[0]
        return jnp.broadcast_to(
            sg[:, None, :], (g_rows, group, tile)
        ).reshape(g_rows * group, tile)

    s_lo = expand(s[:n_half_groups].astype(jnp.bfloat16))
    s_hi = expand(s[n_half_groups:].astype(jnp.bfloat16))
    w_lo = lo * s_lo
    w_hi = hi * s_hi

    x = x_ref[:]  # (B, I)
    x_lo = x[:, :half]
    x_hi = x[:, half:]
    y = jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32) + jnp.dot(
        x_hi, w_hi, preferred_element_type=jnp.float32
    )
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul(x, p, gs, interpret: bool = False):
    """x (B, I) @ packed-int4 W -> (B, O). Tiles over rows and output
    columns so VMEM stays bounded for both decode (B~1) and prefill
    (B = batch*seq) shapes."""
    b, i = x.shape
    half, o = p.shape
    assert half * 2 == i, (x.shape, p.shape)
    n_groups = gs.shape[0]
    group = i // n_groups
    assert half % group == 0, "groups must not straddle the half split"

    tile_o = min(o, 256)
    while o % tile_o:
        tile_o //= 2
    tile_b = min(b, 128)

    kernel = functools.partial(_int4_mm_kernel, group=group)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, o), x.dtype),
        grid=(pl.cdiv(b, tile_b), o // tile_o),
        in_specs=[
            pl.BlockSpec((tile_b, i), lambda r, j: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((half, tile_o), lambda r, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, tile_o), lambda r, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, tile_o), lambda r, j: (r, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, p, gs)


def int4_matmul_reference(x, p, gs):
    """jnp reference (same math, no kernel) for testing/fallback."""
    half = p.shape[-2]
    lo = (p & 0xF).astype(jnp.int8) - 8
    hi = (p >> 4).astype(jnp.int8) - 8
    q = jnp.concatenate([lo, hi], axis=-2)
    i = q.shape[-2]
    g = i // gs.shape[-2]
    w = q.astype(jnp.float32) * jnp.repeat(gs, g, axis=-2).astype(jnp.float32)
    return (x.astype(jnp.float32) @ w).astype(x.dtype)
