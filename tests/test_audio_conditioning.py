"""AudioPart continuous-feature conditioning (audio_projector path).

The reference declares this pathway but leaves it dead (`llama.py:421-433`
warns when the projector is absent; `content_sequence.py` raises on
AudioPart). Here it is fully wired: features -> linear projector -> REPLACES
the token embedding at masked positions (scaled 1/sqrt(2) when
scale_codebook_embeddings).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.config import dual_ar_tiny
from fish_speech_tpu.models import dual_ar
from fish_speech_tpu.sequence import AudioPart, ContentSequence, TextPart
from fish_speech_tpu.tokenizer import build_test_tokenizer

FEAT = 12


def make_cfg(**kw):
    return dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3,
        audio_feature_dim=FEAT, **kw,
    )


def test_projector_initialized():
    cfg = make_cfg()
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    assert params["audio_projector"]["w"].shape == (FEAT, cfg.dim)
    cfg0 = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3)
    params0 = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg0, dtype=jnp.float32)
    assert "audio_projector" not in params0


def test_embed_replaces_masked_positions():
    cfg = make_cfg()
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b, t = 2, 9
    inp = np.zeros((b, cfg.num_codebooks + 1, t), dtype=np.int32)
    inp[:, 0] = rng.integers(4, 200, size=(b, t))
    feats = rng.normal(size=(b, t, FEAT)).astype(np.float32)
    mask = np.zeros((b, t), dtype=bool)
    mask[0, 2:5] = True
    mask[1, 0] = True

    base = np.asarray(dual_ar.embed_tokens(params, cfg, jnp.asarray(inp)))
    out = np.asarray(
        dual_ar.embed_tokens(
            params, cfg, jnp.asarray(inp), jnp.asarray(feats), jnp.asarray(mask)
        )
    )
    ap = params["audio_projector"]
    want = feats @ np.asarray(ap["w"]) + np.asarray(ap["b"])
    if cfg.scale_codebook_embeddings:
        want = want / math.sqrt(2)
    np.testing.assert_allclose(out[mask], want[mask], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(out[~mask], base[~mask])


def test_forward_train_accepts_audio(caplog):
    cfg = make_cfg()
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    b, t = 1, 8
    inp = np.zeros((b, cfg.num_codebooks + 1, t), dtype=np.int32)
    inp[:, 0] = rng.integers(4, 200, size=(b, t))
    feats = rng.normal(size=(b, t, FEAT)).astype(np.float32)
    mask = np.zeros((b, t), dtype=bool)
    mask[0, 3:6] = True

    tok0, _ = dual_ar.forward_train(params, cfg, jnp.asarray(inp), remat=False)
    tok1, _ = dual_ar.forward_train(
        params, cfg, jnp.asarray(inp), remat=False,
        audio_features=jnp.asarray(feats), audio_mask=jnp.asarray(mask),
    )
    # conditioning changes logits at/after the masked region, not before
    assert not np.allclose(np.asarray(tok0[0, 3]), np.asarray(tok1[0, 3]))
    np.testing.assert_allclose(
        np.asarray(tok0[0, :3]), np.asarray(tok1[0, :3]), rtol=1e-5, atol=1e-5
    )


def test_missing_projector_warns_and_ignores(caplog):
    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3)
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    inp = jnp.zeros((1, cfg.num_codebooks + 1, 4), dtype=jnp.int32)
    feats = jnp.zeros((1, 4, FEAT), jnp.float32)
    mask = jnp.zeros((1, 4), dtype=bool)
    import logging

    with caplog.at_level(logging.WARNING):
        out = dual_ar.embed_tokens(params, cfg, inp, feats, mask)
    base = dual_ar.embed_tokens(params, cfg, inp)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
    assert any("audio_projector" in r.message for r in caplog.records)


def test_align_audio_features_layout():
    tok = build_test_tokenizer()
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(6, FEAT)).astype(np.float32)
    seq = ContentSequence(modality="voice")
    seq.append(TextPart(text="hi"))
    seq.append(AudioPart(features=feats))
    seq.append(TextPart(text="bye"))
    enc = seq.encode(tok, add_shift=False)

    aligned = ContentSequence.align_audio_features(enc)
    assert aligned.shape == (len(enc.tokens), FEAT)
    idx = np.nonzero(enc.audio_masks)[0]
    assert len(idx) == 4  # 6 frames minus start/end delimiters
    np.testing.assert_array_equal(aligned[idx], feats[1:-1])
    off = np.ones(len(enc.tokens), dtype=bool)
    off[idx] = False
    assert not aligned[off].any()


def test_align_audio_features_none_without_parts():
    tok = build_test_tokenizer()
    seq = ContentSequence(modality="text")
    seq.append(TextPart(text="plain"))
    enc = seq.encode(tok)
    assert ContentSequence.align_audio_features(enc) is None


def test_generation_session_audio_conditioning():
    """Session-level API: conditioning steers generation deterministically."""
    from fish_speech_tpu.config import SamplingConfig
    from fish_speech_tpu.generate import GenerationSession

    cfg = make_cfg()
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    session = GenerationSession(
        params, cfg, SamplingConfig(), dtype=jnp.float32, decode_chunk_size=8
    )
    rng = np.random.default_rng(3)
    t = 10
    prompt = np.zeros((cfg.num_codebooks + 1, t), dtype=np.int32)
    prompt[0] = rng.integers(4, 200, size=t)
    feats = rng.normal(size=(t, FEAT)).astype(np.float32) * 3
    mask = np.zeros(t, dtype=bool)
    mask[2:7] = True

    out_a = session.generate(
        prompt, jax.random.PRNGKey(7), max_new_tokens=10,
        audio_features=feats, audio_mask=mask,
    )
    out_b = session.generate(prompt, jax.random.PRNGKey(7), max_new_tokens=10)
    out_a2 = session.generate(
        prompt, jax.random.PRNGKey(7), max_new_tokens=10,
        audio_features=feats, audio_mask=mask,
    )
    np.testing.assert_array_equal(out_a, out_a2)  # deterministic
    assert out_a.shape[0] == cfg.num_codebooks + 1
    assert not (
        out_a.shape == out_b.shape and np.array_equal(out_a, out_b)
    )  # conditioning changed the sampled sequence
