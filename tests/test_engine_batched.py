"""TTS engine on top of the continuous batcher (server --pool-size path)."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # jit-compile heavy; fast tier skips with -m 'not heavy'

from fish_speech_tpu.config import SamplingConfig, dac_tiny, dual_ar_tiny
from fish_speech_tpu.engine.batcher import BatcherSession, ContinuousBatcher
from fish_speech_tpu.engine.tts import TTSInferenceEngine, TTSRequest
from fish_speech_tpu.models.dac import init_dac
from fish_speech_tpu.models.dual_ar import init_dual_ar


@pytest.fixture(scope="module")
def engine(tokenizer, tmp_path_factory):
    dac_cfg = dac_tiny()
    cfg = dual_ar_tiny(
        vocab_size=tokenizer.vocab_size,
        semantic_begin_id=tokenizer.semantic_begin_id,
        semantic_end_id=tokenizer.semantic_end_id,
        im_end_id=tokenizer.im_end_id,
        codebook_size=4096,
        num_codebooks=dac_cfg.rvq.total_codebooks,
        max_seq_len=256,
    )
    params = init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    dac_params = init_dac(jax.random.PRNGKey(1), dac_cfg, dtype=jnp.float32)
    batcher = ContinuousBatcher(
        params, cfg, SamplingConfig(), pool_size=2, dtype=jnp.float32,
        decode_chunk_size=4,
    )
    session = BatcherSession(batcher)
    eng = TTSInferenceEngine(
        session, tokenizer, dac_params, dac_cfg,
        references_dir=str(tmp_path_factory.mktemp("refs")),
    )
    yield eng
    batcher.shutdown()


def test_engine_through_batcher(engine):
    results = list(engine.inference(TTSRequest(text="pooled", max_new_tokens=8)))
    final = [r for r in results if r.code == "final"]
    assert len(final) == 1
    sr, audio = final[0].audio
    assert sr == engine.sample_rate and len(audio) > 0


def test_engine_concurrent_through_batcher(engine):
    outs = {}

    def worker(i):
        rs = list(
            engine.inference(
                TTSRequest(text=f"request number {i}", max_new_tokens=6, seed=i)
            )
        )
        outs[i] = [r.code for r in rs]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(outs) == 4
    for codes in outs.values():
        assert codes[-1] == "final"


def test_engine_streaming_per_decode_chunk(engine):
    """Streaming yields MULTIPLE segment events per text segment (one per
    decode chunk) and their concatenation matches the non-streaming audio
    for the same seed."""
    req = dict(text="stream this text", max_new_tokens=12, seed=9)
    stream = list(engine.inference(TTSRequest(streaming=True, **req)))
    segs = [r for r in stream if r.code == "segment"]
    assert [r.code for r in stream][0] == "header"
    assert len(segs) >= 2, "expected per-decode-chunk segments"
    streamed = np.concatenate([r.audio[1] for r in segs], axis=0)

    plain = list(engine.inference(TTSRequest(streaming=False, **req)))
    final = [r for r in plain if r.code == "final"][0]
    np.testing.assert_allclose(
        streamed, final.audio[1], atol=1e-5,
        err_msg="streamed segments must reassemble the full waveform",
    )


def test_engine_pathological_texts(engine):
    """Degenerate inputs synthesize or fail CLEANLY: empty/whitespace/
    punctuation-only text, emoji-only (cleaned away), RTL, CJK, control
    bytes, speaker tags, and special-token injection all produce a final
    result; an unsplittable word longer than the model context produces
    the descriptive budget error, never a crash."""
    texts = [
        "", "   ", "....,,,,!!!!", "😀🚀🎉", "مرحبا بالعالم",
        "日本語のテキストです", "<|speaker:0|>tagged text",
        "line\nbreaks\n\n\neverywhere", "\x00null\x01bytes",
        "<|im_end|>special token injection", "<|semantic:5|>inline vq",
    ]
    for t in texts:
        final = err = None
        for r in engine.inference(TTSRequest(text=t, max_new_tokens=6)):
            if r.code == "final":
                final = r
            elif r.code == "error":
                err = r.error
        assert final is not None and err is None, (repr(t), err)

    # one huge unsplittable word: clean budget error, not a crash
    outcomes = [r.code for r in engine.inference(
        TTSRequest(text="a" * 2000, max_new_tokens=6))]
    assert outcomes == ["error"]


def test_vqgan_endpoints_concurrent_with_pooled_generation(engine):
    """The one untested thread seam (VERDICT r3): raw-codec encode/decode
    calls arrive on arbitrary executor threads while the batcher worker
    thread owns the pooled decode state. Params are read-only and JAX
    dispatch is thread-safe; this pins it with an actual interleaving."""
    import io
    import threading
    import wave

    frame = engine.codec_cfg.frame_length
    sr = engine.codec_cfg.sample_rate

    def wav_bytes(seed, n):
        x = (np.random.default_rng(seed).normal(size=n) * 0.1).astype(np.float32)
        buf = io.BytesIO()
        pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(pcm.tobytes())
        return buf.getvalue()

    errors = []

    def tts_client(i):
        try:
            results = list(engine.inference(
                TTSRequest(text=f"pooled {i}", max_new_tokens=12)))
            for r in results:
                assert r.code != "error", r.error
            assert any(r.code == "final" for r in results)
        except Exception as e:  # pragma: no cover - failure detail
            errors.append(e)

    def codec_client(i):
        try:
            wav = wav_bytes(100 + i, frame * (2 + i))
            codes = engine.encode_references_batch([wav])[0]
            np.testing.assert_array_equal(codes, engine.encode_reference(wav))
            audio = engine.decode_vq_batch([codes])[0]
            assert audio.shape == (codes.shape[1] * frame,)
        except Exception as e:  # pragma: no cover - failure detail
            errors.append(e)

    threads = [threading.Thread(target=tts_client, args=(i,)) for i in range(4)]
    threads += [threading.Thread(target=codec_client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
