"""Minimal torch stand-in for the `dac` (descript-audio-codec) and
`audiotools` packages, so the REFERENCE `modded_dac.py` / `rvq.py` can be
imported and executed for parity testing without those deps installed.

The reference imports exactly five things from them
(`/root/reference/fish_speech/models/dac/modded_dac.py:8-11`, `rvq.py:8`):

  - `audiotools.AudioSignal`            (imported, never called in the model)
  - `audiotools.ml.BaseModel`           (an nn.Module with save/load sugar)
  - `dac.model.base.CodecMixin`         (compress/decompress helpers; only
                                         `get_delay()` is called at init)
  - `dac.nn.layers.{Snake1d, WNConv1d, WNConvTranspose1d}`
  - `dac.nn.quantize.ResidualVectorQuantize`

These are small, published-algorithm modules (descript-audio-codec is MIT,
the algorithms are from the DAC paper + ViT-VQGAN); the semantics below are
an independent re-expression of the published behavior, matching the numpy
oracle already used in `tests/test_rvq_oracle.py`:

  - Snake activation: x + sin^2(alpha*x)/(alpha+1e-9), per-channel alpha.
  - WNConv*: weight_norm-wrapped convs, OLD-style (`weight_g`/`weight_v`
    state-dict keys, like the published package) so the converter's
    old-style folding path is exercised alongside the reference's own
    new-style parametrizations.
  - VectorQuantize: 1x1-conv project in -> nearest codebook row under
    L2-NORMALIZED euclidean distance -> embed -> 1x1-conv project out;
    straight-through estimator; commitment/codebook MSE losses per batch
    element.
  - ResidualVectorQuantize: greedy residual chain subtracting the
    PROJECTED-BACK quantized vector each stage; quantizer dropout only in
    training mode; `from_codes` sums out-projected codebook rows.

Import and call `install()` BEFORE importing the reference package.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm  # old-style: weight_g / weight_v keys


def WNConv1d(*args, **kwargs):
    return weight_norm(nn.Conv1d(*args, **kwargs))


def WNConvTranspose1d(*args, **kwargs):
    return weight_norm(nn.ConvTranspose1d(*args, **kwargs))


class Snake1d(nn.Module):
    """Snake activation with per-channel learned frequency."""

    def __init__(self, channels):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, channels, 1))

    def forward(self, x):
        shape = x.shape
        x = x.reshape(shape[0], shape[1], -1)
        x = x + (self.alpha + 1e-9).reciprocal() * torch.sin(self.alpha * x).pow(2)
        return x.reshape(shape)


class VectorQuantize(nn.Module):
    def __init__(self, input_dim: int, codebook_size: int, codebook_dim: int):
        super().__init__()
        self.codebook_size = codebook_size
        self.codebook_dim = codebook_dim
        self.in_proj = WNConv1d(input_dim, codebook_dim, kernel_size=1)
        self.out_proj = WNConv1d(codebook_dim, input_dim, kernel_size=1)
        self.codebook = nn.Embedding(codebook_size, codebook_dim)

    def forward(self, z):
        # z: (B, D, T)
        z_e = self.in_proj(z)
        z_q, indices = self.decode_latents(z_e)
        commitment_loss = F.mse_loss(z_e, z_q.detach(), reduction="none").mean([1, 2])
        codebook_loss = F.mse_loss(z_q, z_e.detach(), reduction="none").mean([1, 2])
        z_q = z_e + (z_q - z_e).detach()  # straight-through
        z_q = self.out_proj(z_q)
        return z_q, commitment_loss, codebook_loss, indices, z_e

    def embed_code(self, embed_id):
        return F.embedding(embed_id, self.codebook.weight)

    def decode_code(self, embed_id):
        return self.embed_code(embed_id).transpose(1, 2)

    def decode_latents(self, latents):
        b, d, t = latents.shape
        encodings = latents.permute(0, 2, 1).reshape(b * t, d)
        codebook = self.codebook.weight
        # L2-normalize both sides (ViT-VQGAN-style cosine assignment)
        encodings = F.normalize(encodings)
        codebook = F.normalize(codebook)
        dist = (
            encodings.pow(2).sum(1, keepdim=True)
            - 2 * encodings @ codebook.t()
            + codebook.pow(2).sum(1, keepdim=True).t()
        )
        indices = (-dist).max(1)[1].reshape(b, t)
        z_q = self.decode_code(indices)
        return z_q, indices


class ResidualVectorQuantize(nn.Module):
    def __init__(
        self,
        input_dim: int = 512,
        n_codebooks: int = 9,
        codebook_size: int = 1024,
        codebook_dim=8,
        quantizer_dropout: float = 0.0,
    ):
        super().__init__()
        if isinstance(codebook_dim, int):
            codebook_dim = [codebook_dim for _ in range(n_codebooks)]
        self.n_codebooks = n_codebooks
        self.codebook_dim = codebook_dim
        self.codebook_size = codebook_size
        self.quantizers = nn.ModuleList(
            VectorQuantize(input_dim, codebook_size, codebook_dim[i])
            for i in range(n_codebooks)
        )
        self.quantizer_dropout = quantizer_dropout

    def forward(self, z, n_quantizers: int = None):
        z_q = 0
        residual = z
        commitment_loss = 0
        codebook_loss = 0
        codebook_indices = []
        latents = []

        if n_quantizers is None:
            n_quantizers = self.n_codebooks
        if self.training:
            n_quantizers = torch.ones((z.shape[0],)) * self.n_codebooks + 1
            dropout = torch.randint(1, self.n_codebooks + 1, (z.shape[0],))
            n_dropout = int(z.shape[0] * self.quantizer_dropout)
            n_quantizers[:n_dropout] = dropout[:n_dropout]
            n_quantizers = n_quantizers.to(z.device)

        for i, quantizer in enumerate(self.quantizers):
            if self.training is False and i >= n_quantizers:
                break
            z_q_i, commitment_loss_i, codebook_loss_i, indices_i, z_e_i = quantizer(
                residual
            )
            mask = (
                torch.full((z.shape[0],), fill_value=i, device=z.device)
                < n_quantizers
            )
            z_q = z_q + z_q_i * mask[:, None, None]
            residual = residual - z_q_i  # projected-back quantized vector
            commitment_loss = commitment_loss + (commitment_loss_i * mask).mean()
            codebook_loss = codebook_loss + (codebook_loss_i * mask).mean()
            codebook_indices.append(indices_i)
            latents.append(z_e_i)

        codes = torch.stack(codebook_indices, dim=1)
        latents = torch.cat(latents, dim=1)
        return z_q, codes, latents, commitment_loss, codebook_loss

    def from_codes(self, codes: torch.Tensor):
        z_q = 0.0
        z_p = []
        n_codebooks = codes.shape[1]
        for i in range(n_codebooks):
            z_p_i = self.quantizers[i].decode_code(codes[:, i, :])
            z_p.append(z_p_i)
            z_q = z_q + self.quantizers[i].out_proj(z_p_i)
        return z_q, torch.cat(z_p, dim=1), codes


class CodecMixin:
    """Only `get_delay()` is exercised by the reference model's __init__
    (`modded_dac.py:859`); the stored value is unused on the encode /
    from_indices / forward paths this suite executes."""

    def get_delay(self):
        return 0


class BaseModel(nn.Module):
    """audiotools.ml.BaseModel is an nn.Module with package-save sugar the
    parity tests never call; plain nn.Module suffices as the base."""


class AudioSignal:
    """Imported by the reference module, never instantiated by the model."""


def install():
    """Register the stand-in packages in sys.modules (idempotent)."""
    if "dac" in sys.modules and getattr(sys.modules["dac"], "__standin__", False):
        return

    dac_pkg = types.ModuleType("dac")
    dac_pkg.__standin__ = True
    dac_model = types.ModuleType("dac.model")
    dac_model_base = types.ModuleType("dac.model.base")
    dac_model_base.CodecMixin = CodecMixin
    dac_nn = types.ModuleType("dac.nn")
    dac_nn_layers = types.ModuleType("dac.nn.layers")
    dac_nn_layers.Snake1d = Snake1d
    dac_nn_layers.WNConv1d = WNConv1d
    dac_nn_layers.WNConvTranspose1d = WNConvTranspose1d
    dac_nn_quantize = types.ModuleType("dac.nn.quantize")
    dac_nn_quantize.ResidualVectorQuantize = ResidualVectorQuantize
    dac_nn_quantize.VectorQuantize = VectorQuantize
    dac_pkg.model = dac_model
    dac_model.base = dac_model_base
    dac_pkg.nn = dac_nn
    dac_nn.layers = dac_nn_layers
    dac_nn.quantize = dac_nn_quantize

    audiotools_pkg = types.ModuleType("audiotools")
    audiotools_pkg.__standin__ = True
    audiotools_pkg.AudioSignal = AudioSignal
    audiotools_ml = types.ModuleType("audiotools.ml")
    audiotools_ml.BaseModel = BaseModel
    audiotools_pkg.ml = audiotools_ml

    sys.modules["dac"] = dac_pkg
    sys.modules["dac.model"] = dac_model
    sys.modules["dac.model.base"] = dac_model_base
    sys.modules["dac.nn"] = dac_nn
    sys.modules["dac.nn.layers"] = dac_nn_layers
    sys.modules["dac.nn.quantize"] = dac_nn_quantize
    sys.modules["audiotools"] = audiotools_pkg
    sys.modules["audiotools.ml"] = audiotools_ml
