"""Causal 1D convolution primitives, channels-last (B, T, C).

Exact pad semantics of the reference (`modded_dac.py:485-596`): a causal conv
left-pads `k_eff - stride` and right-pads just enough to make the frame count
integral; a causal transposed conv trims `kernel - stride` from the right.
These asymmetric pads are what make streaming decode possible and give the
prefix-consistency property tested in `tests/test_dac.py`.

Weights are stored pre-folded (weight norm is a training-time
parametrization; the converter folds `g * v / ||v||` at load). Layouts:
  conv:            w (K, Cin, Cout), b (Cout,)
  conv_transpose:  w (K, Cout, Cin), b (Cout,)   [torch layout transposed
                                                  to spatial-major]
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NWC", "WIO", "NWC")


def causal_pad_amounts(length: int, kernel: int, stride: int, dilation: int = 1):
    """(pad_left, pad_right) for a causal conv over `length` samples."""
    k_eff = (kernel - 1) * dilation + 1
    pad_left = k_eff - stride
    n_frames = (length - k_eff + pad_left) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - pad_left)
    return pad_left, max(ideal - length, 0)


def causal_conv1d(x, w, b=None, stride: int = 1, dilation: int = 1,
                  groups: int = 1):
    """x: (B, T, Cin) -> (B, T', Cout)."""
    k = w.shape[0]
    pad_left, pad_right = causal_pad_amounts(x.shape[1], k, stride, dilation)
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def causal_conv_transpose1d(x, w, b=None, stride: int = 1):
    """x: (B, T, Cin) -> (B, T*stride, Cout).

    `w` layout (K, Cout, Cin) — this is the torch ConvTranspose1d weight
    (Cin, Cout, K) rolled to spatial-major; `transpose_kernel=True` makes
    lax.conv_transpose compute the true gradient-of-conv (torch semantics).
    """
    k = w.shape[0]
    y = lax.conv_transpose(
        x,
        w.astype(x.dtype),
        strides=(stride,),
        padding="VALID",
        dimension_numbers=_DN,
        transpose_kernel=True,
    )
    pad = k - stride
    if pad > 0:
        y = y[:, :-pad, :]
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def snake(x, alpha):
    """Snake activation: x + (1/(a+eps)) * sin(a x)^2 with per-channel a.

    Matches descript-audio-codec's Snake1d. Computed in fp32 (cheap VPU op;
    the sin² term is precision-sensitive at bf16).
    """
    xf = x.astype(jnp.float32)
    a = alpha.astype(jnp.float32)
    s = jnp.sin(a * xf)
    out = xf + (1.0 / (a + 1e-9)) * s * s
    return out.astype(x.dtype)


def layer_norm(x, w, b, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mu) * lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


# -- init helpers (trunc-normal like the reference's init_weights) --


def init_conv(key, kernel, c_in, c_out, std: float = 0.02, dtype=jnp.float32):
    w = jax.random.truncated_normal(key, -2, 2, (kernel, c_in, c_out), jnp.float32)
    return {"w": (w * std).astype(dtype), "b": jnp.zeros((c_out,), dtype)}


def init_conv_transpose(key, kernel, c_in, c_out, std: float = 0.02,
                        dtype=jnp.float32):
    w = jax.random.truncated_normal(key, -2, 2, (kernel, c_out, c_in), jnp.float32)
    return {"w": (w * std).astype(dtype), "b": jnp.zeros((c_out,), dtype)}
