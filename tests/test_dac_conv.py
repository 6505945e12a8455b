"""Causal conv primitives vs independent torch implementations of the same
published semantics (left-pad k_eff - stride; transposed conv right-trim)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from fish_speech_tpu.models.dac.conv import (
    causal_conv1d,
    causal_conv_transpose1d,
    causal_pad_amounts,
    snake,
)


@pytest.mark.parametrize(
    "t,cin,cout,k,stride,dil",
    [
        (37, 3, 5, 7, 1, 1),
        (64, 4, 8, 4, 2, 1),
        (50, 2, 2, 7, 1, 3),
        (41, 3, 6, 16, 8, 1),
        (33, 5, 5, 1, 1, 1),
    ],
)
def test_causal_conv_matches_torch(t, cin, cout, k, stride, dil):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, t, cin)).astype(np.float32)
    w = rng.normal(size=(k, cin, cout)).astype(np.float32) * 0.2
    b = rng.normal(size=(cout,)).astype(np.float32)

    got = np.asarray(
        causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                      stride=stride, dilation=dil)
    )

    pad_l, pad_r = causal_pad_amounts(t, k, stride, dil)
    xt = torch.from_numpy(x).permute(0, 2, 1)  # (B, C, T)
    xt = F.pad(xt, (pad_l, pad_r))
    wt = torch.from_numpy(w).permute(2, 1, 0)  # (Cout, Cin, K)
    want = F.conv1d(xt, wt, torch.from_numpy(b), stride=stride, dilation=dil)
    want = want.permute(0, 2, 1).numpy()

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_depthwise_conv_matches_torch():
    rng = np.random.default_rng(1)
    c, t, k = 6, 40, 7
    x = rng.normal(size=(1, t, c)).astype(np.float32)
    w = rng.normal(size=(k, 1, c)).astype(np.float32) * 0.2
    b = rng.normal(size=(c,)).astype(np.float32)
    got = np.asarray(
        causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), groups=c)
    )
    xt = torch.from_numpy(x).permute(0, 2, 1)
    xt = F.pad(xt, (k - 1, 0))
    wt = torch.from_numpy(w).permute(2, 1, 0)  # (C, 1, K)
    want = F.conv1d(xt, wt, torch.from_numpy(b), groups=c).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("t,cin,cout,stride", [(20, 4, 3, 2), (16, 3, 5, 8), (10, 2, 2, 4)])
def test_causal_conv_transpose_matches_torch(t, cin, cout, stride):
    rng = np.random.default_rng(2)
    k = 2 * stride
    x = rng.normal(size=(2, t, cin)).astype(np.float32)
    # our layout: (K, Cout, Cin); torch: (Cin, Cout, K)
    w = rng.normal(size=(k, cout, cin)).astype(np.float32) * 0.2
    b = rng.normal(size=(cout,)).astype(np.float32)

    got = np.asarray(
        causal_conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                stride=stride)
    )

    xt = torch.from_numpy(x).permute(0, 2, 1)
    wt = torch.from_numpy(w).permute(2, 1, 0)  # (Cin, Cout, K)
    want = F.conv_transpose1d(xt, wt, torch.from_numpy(b), stride=stride)
    pad = k - stride
    want = want[..., :-pad] if pad > 0 else want
    want = want.permute(0, 2, 1).numpy()

    assert got.shape == want.shape == (2, t * stride, cout)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_causal_conv_output_length():
    # stride s, kernel 2s: L -> L/s exactly when L % s == 0
    x = jnp.zeros((1, 64, 2))
    w = jnp.zeros((8, 2, 4))
    y = causal_conv1d(x, w, stride=4)
    assert y.shape == (1, 16, 4)
    # stride 1 keeps length
    w2 = jnp.zeros((7, 2, 2))
    assert causal_conv1d(x, w2).shape == (1, 64, 2)


def test_snake_formula():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 10, 4)).astype(np.float32)
    alpha = rng.uniform(0.5, 2.0, size=4).astype(np.float32)
    got = np.asarray(snake(jnp.asarray(x), jnp.asarray(alpha)))
    want = x + (1.0 / (alpha + 1e-9)) * np.sin(alpha * x) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_conv_causality():
    """Changing future samples must not change past outputs."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 32, 3)).astype(np.float32)
    w = rng.normal(size=(7, 3, 3)).astype(np.float32)
    y1 = np.asarray(causal_conv1d(jnp.asarray(x), jnp.asarray(w)))
    x2 = x.copy()
    x2[:, 20:] += 5.0
    y2 = np.asarray(causal_conv1d(jnp.asarray(x2), jnp.asarray(w)))
    np.testing.assert_allclose(y1[:, :20], y2[:, :20], atol=1e-6)
