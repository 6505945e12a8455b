import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import SamplingConfig, dual_ar_tiny
from fish_speech_tpu.generate import (
    GenerationSession,
    generate_long,
    group_turns_into_batches,
    pick_bucket,
    split_text_by_speaker,
)
from fish_speech_tpu.models import dual_ar


def test_split_text_by_speaker():
    text = "<|speaker:0|>hello there<|speaker:1|>hi!"
    turns = split_text_by_speaker(text)
    assert turns == ["<|speaker:0|>hello there", "<|speaker:1|>hi!"]
    assert split_text_by_speaker("no tags here") == []


def test_group_turns_byte_budget():
    turns = ["<|speaker:0|>" + "a" * 50, "<|speaker:1|>" + "b" * 50,
             "<|speaker:0|>" + "c" * 50]
    batches = group_turns_into_batches(turns, max_speakers=5, max_bytes=80)
    assert len(batches) == 3
    batches = group_turns_into_batches(turns, max_speakers=5, max_bytes=1000)
    assert len(batches) == 1
    batches = group_turns_into_batches(turns, max_speakers=2, max_bytes=1000)
    assert len(batches) == 2


def test_pick_bucket():
    assert pick_bucket(10, 4096) == 64
    assert pick_bucket(65, 4096) == 128
    assert pick_bucket(3000, 4096) == 4096
    with pytest.raises(ValueError):
        pick_bucket(5000, 4096)


@pytest.fixture(scope="module")
def session(tokenizer):
    cfg = dual_ar_tiny(
        vocab_size=tokenizer.vocab_size,
        semantic_begin_id=tokenizer.semantic_begin_id,
        semantic_end_id=tokenizer.semantic_end_id,
        im_end_id=tokenizer.im_end_id,
        codebook_size=4096,
        num_codebooks=3,
        max_seq_len=256,
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return GenerationSession(
        params, cfg, SamplingConfig(), max_batch=1,
        dtype=jnp.float32, decode_chunk_size=8,
    )


def test_generate_budget_and_shapes(session, tokenizer):
    prompt = np.zeros((session.cfg.num_codebooks + 1, 12), dtype=np.int32)
    prompt[0] = tokenizer.encode("hello hello!")
    seq = session.generate(
        prompt, jax.random.PRNGKey(0), max_new_tokens=20,
        temperature=1.0, top_p=0.9, top_k=30,
    )
    assert seq.shape[0] == session.cfg.num_codebooks + 1
    assert 1 <= seq.shape[1] <= 20
    main = seq[0]
    sb, se = session.cfg.semantic_begin_id, session.cfg.semantic_end_id
    ok = ((main >= sb) & (main <= se)) | (main == session.cfg.im_end_id)
    assert ok.all(), "constrained decoding emitted an out-of-range token"
    # codebook rows within range
    assert (seq[1:] >= 0).all()
    assert (seq[1:] < session.cfg.codebook_size).all()


def test_decode_signatures_mirror_host_loop(session):
    # first chunk = first_chunk_size (== decode_chunk_size here, 8), then
    # steady chunks; kv bucket from the session's kv_buckets
    sigs = session.decode_signatures(12, 20)
    assert sigs == [(8, session._kv_bucket(12 + 8 + 1))]
    sigs = session.decode_signatures(12, 200, first_chunk=2)
    assert sigs[0] == (2, session._kv_bucket(12 + 2 + 1))
    assert all(n == 8 for n, _ in sigs[1:])
    # kv_len is non-decreasing along the run
    kvs = [kv for _, kv in sigs]
    assert kvs == sorted(kvs)


def test_precompile_matches_dispatch_signatures(session, tokenizer):
    """precompile AOT-builds the same programs generate dispatches: a
    generate right after precompile must be bit-identical to one from an
    untouched session (precompile touches no live state)."""
    times = session.precompile(8, max_new_tokens=10)
    assert any(k.startswith("prefill_") for k in times)
    assert any(k.startswith("decode_") for k in times)
    prompt = np.zeros((session.cfg.num_codebooks + 1, 8), dtype=np.int32)
    prompt[0] = tokenizer.encode("abcdefgh")
    s1 = session.generate(prompt, jax.random.PRNGKey(7), max_new_tokens=10)
    s2 = session.generate(prompt, jax.random.PRNGKey(7), max_new_tokens=10)
    np.testing.assert_array_equal(s1, s2)


def test_aot_dispatch_matches_jit(tokenizer):
    """Generation through the precompiled AOT executables must be
    token-identical to jit-path generation from an identical session that
    never ran precompile — for both the batch-1 and the batched lockstep
    paths (covers donation + operand aval agreement of the AOT route)."""
    cfg = dual_ar_tiny(
        vocab_size=tokenizer.vocab_size,
        semantic_begin_id=tokenizer.semantic_begin_id,
        semantic_end_id=tokenizer.semantic_end_id,
        im_end_id=tokenizer.im_end_id,
        codebook_size=4096,
        num_codebooks=3,
        max_seq_len=256,
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.float32)
    prompt = np.zeros((cfg.num_codebooks + 1, 8), dtype=np.int32)
    prompt[0] = tokenizer.encode("abcdefgh")

    for batch in (1, 3):
        mk = lambda: GenerationSession(
            params, cfg, SamplingConfig(), max_batch=batch,
            dtype=jnp.float32, decode_chunk_size=8,
        )
        aot, jit_only = mk(), mk()
        times = aot.precompile(8, max_new_tokens=10, batch=batch)
        assert "execute" in times
        assert aot._aot and not jit_only._aot
        if batch == 1:
            out_a = aot.generate(prompt, jax.random.PRNGKey(7),
                                 max_new_tokens=10)
            out_j = jit_only.generate(prompt, jax.random.PRNGKey(7),
                                      max_new_tokens=10)
            np.testing.assert_array_equal(out_a, out_j)
        else:
            outs_a = aot.generate_batch([prompt] * batch,
                                        jax.random.PRNGKey(7),
                                        max_new_tokens=10)
            outs_j = jit_only.generate_batch([prompt] * batch,
                                             jax.random.PRNGKey(7),
                                             max_new_tokens=10)
            for a, j in zip(outs_a, outs_j):
                np.testing.assert_array_equal(a, j)


def test_aot_dispatch_matches_jit_streaming(tokenizer):
    """The streaming paths (host partials and device partials) through the
    precompiled AOT executables yield the same cumulative columns as an
    identical jit-only session."""
    cfg = dual_ar_tiny(
        vocab_size=tokenizer.vocab_size,
        semantic_begin_id=tokenizer.semantic_begin_id,
        semantic_end_id=tokenizer.semantic_end_id,
        im_end_id=tokenizer.im_end_id,
        codebook_size=4096,
        num_codebooks=3,
        max_seq_len=256,
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(5), cfg,
                                  dtype=jnp.float32)
    prompt = np.zeros((cfg.num_codebooks + 1, 8), dtype=np.int32)
    prompt[0] = tokenizer.encode("abcdefgh")
    mk = lambda: GenerationSession(
        params, cfg, SamplingConfig(), max_batch=1,
        dtype=jnp.float32, decode_chunk_size=8,
    )
    aot, jit_only = mk(), mk()
    aot.precompile(8, max_new_tokens=16)
    for device_partials in (False, True):
        outs_a = list(aot.generate_stream(
            prompt, jax.random.PRNGKey(9), max_new_tokens=16,
            device_partials=device_partials))
        outs_j = list(jit_only.generate_stream(
            prompt, jax.random.PRNGKey(9), max_new_tokens=16,
            device_partials=device_partials))
        assert len(outs_a) == len(outs_j)
        last_a = (np.asarray(outs_a[-1].host())
                  if device_partials else outs_a[-1])
        last_j = (np.asarray(outs_j[-1].host())
                  if device_partials else outs_j[-1])
        np.testing.assert_array_equal(last_a, last_j)


def test_generate_deterministic_given_key(session, tokenizer):
    prompt = np.zeros((session.cfg.num_codebooks + 1, 8), dtype=np.int32)
    prompt[0] = tokenizer.encode("abcdefgh")
    s1 = session.generate(prompt, jax.random.PRNGKey(7), max_new_tokens=10)
    s2 = session.generate(prompt, jax.random.PRNGKey(7), max_new_tokens=10)
    np.testing.assert_array_equal(s1, s2)


def test_generate_long_yields_codes(session, tokenizer):
    responses = list(
        generate_long(
            session=session,
            tokenizer=tokenizer,
            text="short test",
            max_new_tokens=12,
            chunk_length=300,
        )
    )
    assert responses[-1].action == "next"
    samples = [r for r in responses if r.action == "sample"]
    assert len(samples) == 1
    codes = samples[0].codes
    assert codes.shape[0] == session.cfg.num_codebooks
    assert (codes >= 0).all()


def test_generate_long_voice_clone_prompt(session, tokenizer):
    ref_codes = np.random.default_rng(0).integers(
        0, 64, size=(session.cfg.num_codebooks, 6)
    ).astype(np.int32)
    responses = list(
        generate_long(
            session=session,
            tokenizer=tokenizer,
            text="cloned voice",
            max_new_tokens=8,
            prompt_text="reference text",
            prompt_tokens=ref_codes,
        )
    )
    samples = [r for r in responses if r.action == "sample"]
    assert len(samples) == 1


def test_generate_stream_cumulative(session):
    """generate_stream yields growing cumulative prefixes; the last equals
    generate() for the same key."""
    cfg = session.cfg
    rng = np.random.default_rng(11)
    prompt = np.zeros((cfg.num_codebooks + 1, 8), dtype=np.int32)
    prompt[0] = rng.integers(4, 200, size=8)

    outs = list(
        session.generate_stream(
            prompt, jax.random.PRNGKey(3), max_new_tokens=18
        )
    )
    assert len(outs) >= 2  # prefill frame + at least one chunk
    for a, b in zip(outs, outs[1:]):
        assert b.shape[1] > a.shape[1]
        np.testing.assert_array_equal(a, b[:, : a.shape[1]])  # true prefixes

    full = session.generate(prompt, jax.random.PRNGKey(3), max_new_tokens=18)
    np.testing.assert_array_equal(outs[-1], full)


def test_generate_stream_device_partials_equivalent(session):
    """device_partials=True yields device-resident cumulative columns whose
    trimmed values are IDENTICAL to the host streaming path for the same
    key (the low-TTFA engine path must not change outputs)."""
    cfg = session.cfg
    rng = np.random.default_rng(12)
    prompt = np.zeros((cfg.num_codebooks + 1, 8), dtype=np.int32)
    prompt[0] = rng.integers(4, 200, size=8)

    host_outs = list(
        session.generate_stream(
            prompt, jax.random.PRNGKey(5), max_new_tokens=18
        )
    )
    dev_parts = list(
        session.generate_stream(
            prompt, jax.random.PRNGKey(5), max_new_tokens=18,
            device_partials=True,
        )
    )
    assert len(dev_parts) == len(host_outs)
    # trimmed device values == host values at every yield
    for hp, dp in zip(host_outs, dev_parts):
        dev_host = dp.host()
        n_valid = dp.valid_frames()
        # host yields include a trailing im_end column; valid_frames stops
        # before it — compare the common frame prefix and the budget cap
        n_host_frames = hp.shape[1] - (
            1 if hp[0, -1] == cfg.im_end_id else 0
        )
        assert n_valid == min(n_host_frames, 18)
        np.testing.assert_array_equal(
            dev_host[:, :n_valid], hp[:, :n_valid]
        )
    # full sequence reconstructable from the last partial
    last = dev_parts[-1]
    v = last.valid_frames()
    np.testing.assert_array_equal(
        last.host()[1:, :v], host_outs[-1][1:, :v]
    )


def test_generate_long_device_partials_audio_equivalence(session, tokenizer):
    """generate_long(device_partials=True) partials, trimmed via
    valid_frames(), must reproduce the host partials exactly."""
    from fish_speech_tpu.generate import generate_long

    kw = dict(
        session=session, tokenizer=tokenizer, text="hello world",
        max_new_tokens=12, seed=7, stream_partials=True,
    )
    host = [
        (r.action, None if r.codes is None else np.asarray(r.codes))
        for r in generate_long(**kw)
    ]
    dev = []
    for r in generate_long(**kw, device_partials=True):
        if r.action == "partial":
            n = r.valid_frames()
            dev.append(("partial", np.asarray(r.codes)[:, :n]))
        else:
            dev.append((r.action, None if r.codes is None else r.codes))
    host_partials = [c for a, c in host if a == "partial"]
    dev_partials = [c for a, c in dev if a == "partial"]
    assert len(host_partials) == len(dev_partials)
    for h, d in zip(host_partials, dev_partials):
        np.testing.assert_array_equal(h, d)
    h_sample = [c for a, c in host if a == "sample"]
    d_sample = [c for a, c in dev if a == "sample"]
    assert len(h_sample) == len(d_sample) == 1
    np.testing.assert_array_equal(h_sample[0], d_sample[0])


def test_odd_max_seq_len_bucket_clamped():
    """A non-power-of-two max_seq_len must not pick a prompt bucket larger
    than the rope table (ADVICE r1: bucket 4096 for max_seq_len 3000)."""
    from fish_speech_tpu.generate import pick_bucket

    cache_len = 272 + 32  # odd max_seq_len 272 + decode chunk
    assert min(pick_bucket(270, cache_len), 272) == 272

    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3,
                       max_seq_len=200)  # not a bucket boundary
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    session = GenerationSession(params, cfg, max_batch=1, dtype=jnp.float32,
                                decode_chunk_size=8)
    prompt = np.zeros((cfg.num_codebooks + 1, 150), dtype=np.int32)
    prompt[0] = np.arange(150) % 90 + 5
    out = session.generate(prompt, jax.random.PRNGKey(1), max_new_tokens=4)
    assert out.shape[0] == cfg.num_codebooks + 1
