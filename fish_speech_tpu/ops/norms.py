"""Normalization ops (fp32 internal math, cast back to input dtype)."""

import jax.numpy as jnp
from jax import lax


def rms_norm(x, weight, eps: float = 1e-5):
    """RMSNorm over the last axis.

    Matches the reference numerics (`llama.py:990-1001`): normalize in fp32,
    cast back to input dtype, THEN scale by the (possibly bf16) weight.
    """
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * lax.rsqrt(var + eps)
    return normed.astype(x.dtype) * weight
