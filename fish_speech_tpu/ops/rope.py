"""Rotary position embeddings, adjacent-pair layout.

Matches the reference layout (`llama.py:1004-1038`): head dims are grouped as
(d/2, 2) adjacent real/imag pairs and the table stores [cos, sin] stacked on a
trailing axis of size 2.
"""

import jax.numpy as jnp
import numpy as np


def precompute_rope(seq_len: int, n_elem: int, base: float = 10000.0,
                    dtype=jnp.bfloat16):
    """Returns the rope table with shape (seq_len, n_elem // 2, 2)."""
    freqs = 1.0 / (
        base ** (np.arange(0, n_elem, 2)[: n_elem // 2].astype(np.float64) / n_elem)
    )
    t = np.arange(seq_len, dtype=np.float64)
    angles = np.outer(t, freqs)  # (S, d/2)
    table = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    return jnp.asarray(table, dtype=dtype)


def apply_rope(x, freqs):
    """Rotate x by the rope table.

    Args:
      x: (..., S, H, D) activations (sequence axis second-to-last-but-one).
      freqs: (S, D//2, 2) table slice for these positions.

    Returns rotated x with the same shape/dtype.
    """
    *lead, s, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(*lead, s, h, d // 2, 2)
    fr = freqs.astype(jnp.float32).reshape(
        *([1] * len(lead)), s, 1, d // 2, 2
    )
    real = xf[..., 0] * fr[..., 0] - xf[..., 1] * fr[..., 1]
    imag = xf[..., 1] * fr[..., 0] + xf[..., 0] * fr[..., 1]
    out = jnp.stack([real, imag], axis=-1).reshape(*lead, s, h, d)
    return out.astype(x.dtype)
