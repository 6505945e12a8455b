import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import CodecTransformerConfig, dac_tiny
from fish_speech_tpu.models.dac import rvq as rvq_mod
from fish_speech_tpu.models.dac.model import (
    dac_encode,
    dac_forward,
    dac_from_indices,
    init_dac,
)
from fish_speech_tpu.models.dac.transformer import (
    codec_transformer,
    init_codec_transformer,
)


@pytest.fixture(scope="module")
def codec():
    cfg = dac_tiny()
    params = init_dac(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def test_encode_shapes_and_frame_math(codec):
    cfg, params = codec
    t = int(cfg.frame_length * 3.5)  # non-multiple of frame length
    audio = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 1, t)).astype(np.float32) * 0.1
    )
    codes, lengths = dac_encode(params, cfg, audio)
    assert codes.shape[1] == cfg.rvq.total_codebooks
    assert codes.shape[2] == 4  # ceil(3.5)
    assert int(lengths[0]) == 4
    assert (np.asarray(codes[:, 0]) < cfg.rvq.semantic_codebook_size).all()
    assert (np.asarray(codes[:, 1:]) < cfg.rvq.codebook_size).all()


def test_decode_shapes(codec):
    cfg, params = codec
    codes = jnp.asarray(
        np.random.default_rng(1).integers(
            0, cfg.rvq.codebook_size, size=(1, cfg.rvq.total_codebooks, 5)
        ).astype(np.int32)
    )
    audio = dac_from_indices(params, cfg, codes)
    assert audio.shape == (1, 1, 5 * cfg.frame_length)
    assert np.abs(np.asarray(audio)).max() <= 1.0  # tanh output


def test_decode_clamps_out_of_range(codec):
    cfg, params = codec
    codes = np.zeros((1, cfg.rvq.total_codebooks, 3), dtype=np.int32)
    codes[0, 0, 0] = cfg.rvq.semantic_codebook_size + 100
    codes[0, 1, 0] = cfg.rvq.codebook_size + 7
    audio = dac_from_indices(params, cfg, jnp.asarray(codes))
    assert np.isfinite(np.asarray(audio)).all()


def test_roundtrip_consistency(codec):
    """encode -> decode(codes) must equal the z produced by forward."""
    cfg, params = codec
    rng = np.random.default_rng(2)
    t = cfg.frame_length * 2
    audio = jnp.asarray(rng.normal(size=(1, 1, t)).astype(np.float32) * 0.1)
    codes, _ = dac_encode(params, cfg, audio)
    a1 = dac_from_indices(params, cfg, codes)
    a2 = dac_from_indices(params, cfg, codes)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))


def test_rvq_prefix_consistency(codec):
    """The causal-conv property: quantizing a prefix gives the prefix of the
    full result (ports the reference's inline check `rvq.py:374-399`)."""
    cfg, _ = codec
    rvq_params = rvq_mod.init_downsample_rvq(
        jax.random.PRNGKey(3), cfg.rvq, dtype=jnp.float32
    )
    rng = np.random.default_rng(3)
    t = 48
    z = jnp.asarray(rng.normal(size=(2, t, cfg.rvq.input_dim)).astype(np.float32))
    full = rvq_mod.downsample_rvq_encode(rvq_params, cfg.rvq, z)
    short = rvq_mod.downsample_rvq_encode(rvq_params, cfg.rvq, z[:, :40])
    np.testing.assert_allclose(
        np.asarray(full["z"][:, :40]), np.asarray(short["z"]), atol=1e-5
    )


def test_rvq_decode_matches_encode_z(codec):
    """decode(codes) must reproduce the quantized z path of encode (without
    the straight-through input): semantic + residual -> post -> upsample."""
    cfg, _ = codec
    rvq_params = rvq_mod.init_downsample_rvq(
        jax.random.PRNGKey(4), cfg.rvq, dtype=jnp.float32
    )
    rng = np.random.default_rng(4)
    z = jnp.asarray(rng.normal(size=(1, 16, cfg.rvq.input_dim)).astype(np.float32))
    enc = rvq_mod.downsample_rvq_encode(rvq_params, cfg.rvq, z)
    dec = rvq_mod.downsample_rvq_decode(rvq_params, cfg.rvq, enc["codes"])
    # enc['z'] is padded/cropped to input length; dec is the raw upsample
    np.testing.assert_allclose(
        np.asarray(enc["z"]), np.asarray(dec[:, : enc["z"].shape[1]]), atol=1e-5
    )


def test_codec_transformer_window_causality():
    cfg = CodecTransformerConfig(
        n_layer=2, n_head=2, dim=32, intermediate_size=64, head_dim=16,
        window_size=4,
    ).resolve()
    params = init_codec_transformer(jax.random.PRNGKey(5), cfg, 32)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 20, 32)).astype(np.float32))
    y1 = codec_transformer(params, cfg, x)
    x2 = x.at[:, 15:].add(3.0)
    y2 = codec_transformer(params, cfg, x2)
    np.testing.assert_allclose(
        np.asarray(y1[:, :15]), np.asarray(y2[:, :15]), atol=1e-5
    )
    assert not np.allclose(np.asarray(y1[:, 15:]), np.asarray(y2[:, 15:]))


def test_codec_transformer_windowing_limits_context():
    """With window w, output at position i only depends on inputs in
    (i-w, i]."""
    cfg = CodecTransformerConfig(
        n_layer=1, n_head=1, dim=16, intermediate_size=32, head_dim=16,
        window_size=3,
    ).resolve()
    params = init_codec_transformer(jax.random.PRNGKey(6), cfg, 16)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 12, 16)).astype(np.float32))
    y1 = codec_transformer(params, cfg, x)
    # change position 2; outputs at positions >= 2+3 must be unchanged
    x2 = x.at[:, 2].add(1.0)
    y2 = codec_transformer(params, cfg, x2)
    np.testing.assert_allclose(
        np.asarray(y1[:, 5:]), np.asarray(y2[:, 5:]), atol=1e-5
    )


def test_forward_training_roundtrip(codec):
    cfg, params = codec
    rng = np.random.default_rng(7)
    audio = jnp.asarray(
        rng.normal(size=(1, 1, cfg.frame_length * 2 + 100)).astype(np.float32) * 0.1
    )
    out, result = dac_forward(params, cfg, audio, key=jax.random.PRNGKey(0))
    assert out.shape == audio.shape
    assert np.isfinite(np.asarray(result["commitment_loss"])).all()
    assert np.isfinite(np.asarray(result["codebook_loss"])).all()


def test_decode_prefix_consistency(codec):
    """Padding codes on the right must not change earlier output samples —
    the property the engine's bucketed segment decode relies on."""
    cfg, params = codec
    rng = np.random.default_rng(9)
    codes = rng.integers(
        0, cfg.rvq.codebook_size, size=(1, cfg.rvq.total_codebooks, 6)
    ).astype(np.int32)
    full = dac_from_indices(params, cfg, jnp.asarray(codes))
    padded = np.zeros((1, cfg.rvq.total_codebooks, 10), dtype=np.int32)
    padded[:, :, :6] = codes
    out = dac_from_indices(params, cfg, jnp.asarray(padded))
    n = 6 * cfg.frame_length
    np.testing.assert_allclose(
        np.asarray(full[0, 0]), np.asarray(out[0, 0, :n]), atol=1e-5
    )
