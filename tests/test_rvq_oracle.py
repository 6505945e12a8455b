"""Pin the RVQ semantics against an independent numpy oracle.

`fish_speech_tpu/models/dac/rvq.py` re-implements the descript-audio-codec
`VectorQuantize`/`ResidualVectorQuantize` forward (the reference imports it:
`/root/reference/fish_speech/models/dac/rvq.py:8,226-240`), but the package
is absent in this environment. This oracle is a separate, deliberately
torch-convention (B, d, T) numpy transcription of descript's PUBLISHED
forward algorithm (dac/nn/quantize.py):

  VectorQuantize:
    z_e = in_proj(z)                         # 1x1 conv == matmul + bias
    e, c = l2_normalize(z_e), l2_normalize(codebook)
    dist = |e|^2 - 2 e.c^T + |c|^2;  indices = argmax(-dist)
    z_q = codebook[indices]                  # RAW rows, codebook_dim space
    commitment = mse(z_e, z_q) mean over (d, T) per sample
    codebook   = mse(z_q, z_e) mean over (d, T) per sample
    z_q = z_e + (z_q - z_e)  [straight-through at value level]
    z_q = out_proj(z_q)

  ResidualVectorQuantize:
    residual chain subtracts the OUT-PROJECTED z_q_i; quantizer-dropout
    masks z_q_i and the losses per sample with (i < n_quantizers[b]).

Any silent divergence in our JAX implementation (layout, normalization,
which-space losses, residual chain, dropout masking) fails here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.models.dac import rvq as jrvq


# ---------------------------------------------------------------------------
# The oracle (numpy, torch (B, d, T) layout, no JAX)
# ---------------------------------------------------------------------------


def _np_l2norm(x, axis, eps=1e-12):
    return x / np.sqrt(np.maximum((x * x).sum(axis=axis, keepdims=True), 0) + eps)


def oracle_vq_forward(w_in, b_in, w_out, b_out, codebook, z_bdt):
    """descript VectorQuantize.forward. z_bdt: (B, D, T).

    w_in: (d, D) conv1x1 weight (out, in); w_out: (D, d); codebook: (K, d).
    Returns z_q (B, D, T), codes (B, T), z_e (B, d, T), commitment (B,),
    codebook_loss (B,).
    """
    b, _, t = z_bdt.shape
    z_e = np.einsum("od,bdt->bot", w_in, z_bdt) + b_in[None, :, None]

    # decode_latents: flatten (b t) x d, normalize both, full dist formula
    enc = z_e.transpose(0, 2, 1).reshape(b * t, -1)
    enc_n = _np_l2norm(enc, axis=1)
    cb_n = _np_l2norm(codebook, axis=1)
    dist = (
        (enc_n**2).sum(1, keepdims=True)
        - 2 * enc_n @ cb_n.T
        + (cb_n**2).sum(1, keepdims=True).T
    )
    codes = np.argmax(-dist, axis=1).reshape(b, t)
    z_q_lat = codebook[codes].transpose(0, 2, 1)  # (B, d, T) raw rows

    commitment = ((z_e - z_q_lat) ** 2).mean(axis=(1, 2))
    codebook_loss = ((z_q_lat - z_e) ** 2).mean(axis=(1, 2))

    # straight-through has no effect on values; project back out
    z_q = np.einsum("od,bdt->bot", w_out, z_q_lat) + b_out[None, :, None]
    return z_q, codes, z_e, commitment, codebook_loss


def oracle_rvq_forward(quantizers, z_bdt, n_quantizers=None):
    """descript ResidualVectorQuantize.forward.

    quantizers: list of (w_in, b_in, w_out, b_out, codebook).
    n_quantizers: (B,) active-codebook counts (the dropout mask source);
      None = all active.
    Returns z_q (B, D, T), codes (B, N, T), commitment (B,), codebook (B,).
    """
    bsz = z_bdt.shape[0]
    n = len(quantizers)
    if n_quantizers is None:
        n_quantizers = np.full(bsz, n)
    z_q = np.zeros_like(z_bdt)
    residual = z_bdt.copy()
    commitment = np.zeros(bsz)
    codebook_loss = np.zeros(bsz)
    codes = []
    for i, q in enumerate(quantizers):
        z_q_i, codes_i, _, com_i, cb_i = oracle_vq_forward(*q, residual)
        mask = (np.full(bsz, i) < n_quantizers).astype(np.float64)
        z_q = z_q + z_q_i * mask[:, None, None]
        residual = residual - z_q_i
        commitment = commitment + com_i * mask
        codebook_loss = codebook_loss + cb_i * mask
        codes.append(codes_i)
    return z_q, np.stack(codes, axis=1), commitment, codebook_loss


# ---------------------------------------------------------------------------
# Bridging helpers
# ---------------------------------------------------------------------------


def make_jax_vq(rng, input_dim=16, codebook_size=24, codebook_dim=6):
    """Random params in OUR layout + the same tensors in oracle layout."""
    w_in = rng.normal(size=(codebook_dim, input_dim)).astype(np.float64)
    b_in = rng.normal(size=(codebook_dim,)).astype(np.float64)
    w_out = rng.normal(size=(input_dim, codebook_dim)).astype(np.float64)
    b_out = rng.normal(size=(input_dim,)).astype(np.float64)
    codebook = rng.normal(size=(codebook_size, codebook_dim)).astype(np.float64)
    jparams = {
        "in_proj": {"w": jnp.asarray(w_in.T, jnp.float32),
                    "b": jnp.asarray(b_in, jnp.float32)},
        "out_proj": {"w": jnp.asarray(w_out.T, jnp.float32),
                     "b": jnp.asarray(b_out, jnp.float32)},
        "codebook": jnp.asarray(codebook, jnp.float32),
    }
    return jparams, (w_in, b_in, w_out, b_out, codebook)


RTOL, ATOL = 1e-4, 1e-4


def test_vq_encode_matches_oracle():
    rng = np.random.default_rng(0)
    jparams, oracle_w = make_jax_vq(rng)
    z = rng.normal(size=(3, 11, 16))  # (B, T, D) ours

    r = jrvq.vq_encode(jparams, jnp.asarray(z, jnp.float32))
    z_q, codes, z_e, com, cb = oracle_vq_forward(*oracle_w, z.transpose(0, 2, 1))

    np.testing.assert_array_equal(np.asarray(r["codes"]), codes)
    np.testing.assert_allclose(np.asarray(r["z_q"]), z_q.transpose(0, 2, 1),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(r["latents"]),
                               z_e.transpose(0, 2, 1), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(r["commitment_loss"]), com,
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(r["codebook_loss"]), cb,
                               rtol=RTOL, atol=ATOL)


def test_vq_decode_matches_oracle():
    rng = np.random.default_rng(1)
    jparams, (w_in, b_in, w_out, b_out, codebook) = make_jax_vq(rng)
    codes = rng.integers(0, codebook.shape[0], size=(2, 9))
    got = np.asarray(jrvq.vq_decode(jparams, jnp.asarray(codes)))
    want = np.einsum("od,bdt->bot", w_out,
                     codebook[codes].transpose(0, 2, 1)) + b_out[None, :, None]
    np.testing.assert_allclose(got, want.transpose(0, 2, 1), rtol=RTOL,
                               atol=ATOL)


def test_rvq_encode_matches_oracle():
    """Residual chain: subtract the OUT-PROJECTED z_q_i each stage."""
    rng = np.random.default_rng(2)
    stack, oracle_qs = [], []
    for _ in range(4):
        jp, ow = make_jax_vq(rng)
        stack.append(jp)
        oracle_qs.append(ow)
    z = rng.normal(size=(2, 7, 16))

    r = jrvq.rvq_encode(stack, jnp.asarray(z, jnp.float32))
    z_q, codes, com, cb = oracle_rvq_forward(oracle_qs, z.transpose(0, 2, 1))

    np.testing.assert_array_equal(np.asarray(r["codes"]), codes)
    np.testing.assert_allclose(np.asarray(r["z_q"]), z_q.transpose(0, 2, 1),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(r["commitment_loss"]), com,
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(r["codebook_loss"]), cb,
                               rtol=RTOL, atol=ATOL)

    # decode(codes) == sum of out-projected codebook rows (encode != decode
    # reconstruction only via the straight-through value, which equals the
    # lookup here, so they must agree)
    dec = np.asarray(jrvq.rvq_decode(stack, jnp.asarray(codes)))
    np.testing.assert_allclose(dec, z_q.transpose(0, 2, 1), rtol=RTOL,
                               atol=ATOL)


def test_rvq_quantizer_dropout_matches_oracle():
    """Per-sample dropout mask (i < n_quantizers[b]) gates z_q AND losses,
    while the residual chain keeps subtracting every stage's z_q_i."""
    rng = np.random.default_rng(3)
    stack, oracle_qs = [], []
    for _ in range(4):
        jp, ow = make_jax_vq(rng)
        stack.append(jp)
        oracle_qs.append(ow)
    z = rng.normal(size=(3, 5, 16))
    n_quantizers = np.array([1, 4, 2])

    mask = (np.arange(4)[None, :] < n_quantizers[:, None]).astype(np.float32)
    r = jrvq.rvq_encode(stack, jnp.asarray(z, jnp.float32),
                        dropout_mask=jnp.asarray(mask))
    z_q, codes, com, cb = oracle_rvq_forward(
        oracle_qs, z.transpose(0, 2, 1), n_quantizers
    )

    np.testing.assert_array_equal(np.asarray(r["codes"]), codes)
    np.testing.assert_allclose(np.asarray(r["z_q"]), z_q.transpose(0, 2, 1),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(r["commitment_loss"]), com,
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(r["codebook_loss"]), cb,
                               rtol=RTOL, atol=ATOL)


def test_straight_through_gradient():
    """d z_q / d z must flow through in_proj @ out_proj ONLY (the codebook
    lookup is bypassed by the straight-through estimator)."""
    rng = np.random.default_rng(4)
    jparams, (w_in, b_in, w_out, b_out, codebook) = make_jax_vq(rng)
    z = jnp.asarray(rng.normal(size=(1, 3, 16)), jnp.float32)

    g = jax.grad(lambda zz: jnp.sum(jrvq.vq_encode(jparams, zz)["z_q"]))(z)
    # sum(z_q) = sum(out_proj(z_e + const)): d z_q[o]/d z[D] =
    # sum_d w_out[o,d] w_in[d,D]; summed over o, identical at every (b, t)
    expect = (w_out @ w_in).sum(axis=0)  # (D,)
    np.testing.assert_allclose(
        np.asarray(g), np.broadcast_to(expect, g.shape), rtol=1e-4, atol=1e-4
    )


def test_rvq_n_active_prefix():
    """Eval-time n_active uses exactly the first n codebooks (descript's
    `if not training and i >= n_quantizers: break`)."""
    rng = np.random.default_rng(5)
    stack = [make_jax_vq(rng)[0] for _ in range(4)]
    z = jnp.asarray(rng.normal(size=(1, 6, 16)), jnp.float32)
    r2 = jrvq.rvq_encode(stack[:2], z)
    rn = jrvq.rvq_encode(stack, z, n_active=2)
    np.testing.assert_array_equal(np.asarray(rn["codes"]),
                                  np.asarray(r2["codes"]))
    np.testing.assert_allclose(np.asarray(rn["z_q"]), np.asarray(r2["z_q"]),
                               rtol=1e-6)
