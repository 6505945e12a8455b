"""Executed full-model parity vs the reference PyTorch DualARTransformer.

The strongest correctness gate in the suite: instantiate the REAL reference
model (`/root/reference/fish_speech/models/text2semantic/llama.py`) on CPU
with random weights, `save_pretrained` -> our converter -> assert

  (a) teacher-forced slow logits + fast codebook logits match,
  (b) the KV-cache prefill path (`forward_generate`, llama.py:390-466)
      matches our `prefill`,
  (c) greedy stepwise decode produces IDENTICAL token sequences through both
      frameworks' full cache paths (decode semantics from
      `inference.py:96-181`),
  (d) a state dict with split wq/wk/wv keys converts identically (the
      `fuse_wqkv` load-hook path, llama.py:877-882).

The reference package is imported as untrusted read-only code: we stub its
logger/lora deps and never execute anything but the model definition.
"""

import dataclasses
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from fish_speech_tpu.config import DualARConfig
from fish_speech_tpu.convert.dual_ar import convert_dual_ar
from fish_speech_tpu.models import dual_ar

REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref_llama():
    """Import the reference model definition with its deps stubbed."""
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _Logger:
            def __getattr__(self, name):
                return lambda *a, **k: None

        loguru.logger = _Logger()
        sys.modules["loguru"] = loguru
    if "loralib" not in sys.modules:
        # Only referenced by lora.py's setup_lora, which we never call.
        sys.modules["loralib"] = types.ModuleType("loralib")
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import importlib

    return importlib.import_module("fish_speech.models.text2semantic.llama")


# ---------------------------------------------------------------------------
# Config matrix: "plain" covers the legacy layout (tied head, GQA, no
# qk-norm, fast == slow dims, no scaling); "qwen3ish" covers every structural
# feature of the flagship fish_qwen3_omni layout (untied head, qkv bias,
# qk-norm, distinct fast dims => fast_project_in, codebook embedding
# scaling); "flagship_shape" is the s2-pro layout (10 codebooks, 4:1 GQA) at
# reduced width.
# ---------------------------------------------------------------------------

PLAIN = dict(
    vocab_size=256,
    n_layer=2,
    n_head=4,
    n_local_heads=2,
    head_dim=16,
    dim=64,
    intermediate_size=128,
    max_seq_len=128,
    codebook_size=32,
    num_codebooks=4,
    n_fast_layer=2,
    semantic_begin_id=100,
    semantic_end_id=131,
    tie_word_embeddings=True,
    use_gradient_checkpointing=False,
)

QWEN3ISH = dict(
    vocab_size=256,
    n_layer=2,
    n_head=4,
    n_local_heads=2,
    head_dim=16,
    dim=64,
    intermediate_size=128,
    max_seq_len=128,
    codebook_size=32,
    num_codebooks=4,
    n_fast_layer=2,
    fast_dim=32,
    fast_n_head=2,
    fast_n_local_heads=1,
    fast_head_dim=16,
    fast_intermediate_size=64,
    semantic_begin_id=100,
    semantic_end_id=131,
    tie_word_embeddings=False,
    attention_qkv_bias=True,
    attention_qk_norm=True,
    scale_codebook_embeddings=True,
    use_gradient_checkpointing=False,
)

FLAGSHIP_SHAPE = dict(
    vocab_size=2048,
    n_layer=4,
    n_head=8,
    n_local_heads=2,
    head_dim=32,
    dim=256,
    intermediate_size=512,
    max_seq_len=256,
    codebook_size=64,
    num_codebooks=10,
    n_fast_layer=3,
    fast_dim=128,
    fast_n_head=4,
    fast_n_local_heads=2,
    fast_head_dim=32,
    fast_intermediate_size=256,
    semantic_begin_id=1024,
    semantic_end_id=1087,
    tie_word_embeddings=False,
    attention_qkv_bias=True,
    attention_qk_norm=True,
    scale_codebook_embeddings=True,
    use_gradient_checkpointing=False,
)

IM_END = 4  # arbitrary non-semantic token used as the stop id

RTOL, ATOL = 2e-4, 3e-4


def _build_ref_model(ref_llama, kw, seed=0):
    args = ref_llama.DualARModelArgs(**kw)
    torch.manual_seed(seed)
    model = ref_llama.DualARTransformer(args)
    # _init_weights leaves norm weights at exactly 1 and biases at 0; give
    # every parameter a nontrivial value so parity actually exercises them.
    gen = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name:
                p.copy_(1.0 + 0.1 * torch.randn(p.shape, generator=gen))
            elif p.ndim == 1:  # biases
                p.copy_(0.05 * torch.randn(p.shape, generator=gen))
            else:
                p.copy_(0.04 * torch.randn(p.shape, generator=gen))
    model.eval()
    return model


def _convert(model, tmp_path):
    """reference save_pretrained -> our config + params (the real user flow)."""
    model.save_pretrained(str(tmp_path))
    cfg = DualARConfig.from_json(tmp_path / "config.json")
    cfg = dataclasses.replace(cfg, im_end_id=IM_END)
    params = convert_dual_ar(str(tmp_path / "model.pth"), cfg)
    return cfg, params


def _random_inp(kw, b, t, seed=7):
    """(B, C+1, T) prompt with a text prefix and a semantic tail."""
    rng = np.random.default_rng(seed)
    c = kw["num_codebooks"]
    inp = np.zeros((b, c + 1, t), dtype=np.int64)
    inp[:, 0, :] = rng.integers(5, 90, size=(b, t))
    sem_from = t // 3
    codes = rng.integers(0, kw["codebook_size"], size=(b, c, t))
    span = kw["semantic_end_id"] - kw["semantic_begin_id"] + 1
    inp[:, 0, sem_from:] = kw["semantic_begin_id"] + codes[:, 0, sem_from:] % span
    inp[:, 1:, sem_from:] = codes[:, :, sem_from:]
    return inp


@pytest.mark.parametrize("kw", [PLAIN, QWEN3ISH], ids=["plain", "qwen3ish"])
def test_teacher_forced_parity(ref_llama, tmp_path, kw):
    """ref model.forward(...) == our forward_train on converted weights."""
    model = _build_ref_model(ref_llama, kw)
    cfg, params = _convert(model, tmp_path)

    b, t = 2, 24
    inp = _random_inp(kw, b, t)
    inp_t = torch.tensor(inp)
    with torch.no_grad():
        res = model.forward(
            inp_t,
            labels=inp_t,
            key_padding_mask=torch.zeros(b, t, dtype=torch.bool),
        )
    ref_tok = res.token_logits.numpy()  # (B, T, V)
    ref_cb = res.codebook_logits.numpy()  # (Nsem, C, K) packed row-major

    tok, cb = dual_ar.forward_train(params, cfg, jnp.asarray(inp), remat=False)
    tok, cb = np.asarray(tok), np.asarray(cb)

    np.testing.assert_allclose(tok, ref_tok, rtol=RTOL, atol=ATOL)

    sem = (inp[:, 0] >= kw["semantic_begin_id"]) & (
        inp[:, 0] <= kw["semantic_end_id"]
    )
    ours_cb = cb[sem]  # boolean advanced indexing packs row-major, like torch
    np.testing.assert_allclose(ours_cb, ref_cb, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("kw", [PLAIN, QWEN3ISH], ids=["plain", "qwen3ish"])
def test_prefill_parity(ref_llama, tmp_path, kw):
    """ref forward_generate over the whole prompt == our prefill (logits and
    projected hidden), through both KV-cache implementations."""
    model = _build_ref_model(ref_llama, kw)
    cfg, params = _convert(model, tmp_path)

    t = 16
    inp = _random_inp(kw, 1, t)
    model.setup_caches(1, kw["max_seq_len"], dtype=torch.float32)
    with torch.no_grad():
        res = model.forward_generate(torch.tensor(inp), input_pos=torch.arange(t))
    ref_logits = res.logits[0, -1].numpy()  # (V,)
    ref_hidden = res.hidden_states[0, -1].numpy()  # (fast_dim,) projected

    cache = dual_ar.init_kv_cache(cfg, 1, kw["max_seq_len"], dtype=jnp.float32)
    logits, hidden, cache = dual_ar.prefill(
        params, cfg, jnp.asarray(inp), cache, jnp.zeros((1,), jnp.int32),
        jnp.int32(t),
    )
    ours_hidden = np.asarray(dual_ar.fast_project_in(params, cfg, hidden))[0]

    np.testing.assert_allclose(np.asarray(logits)[0], ref_logits, rtol=RTOL,
                               atol=ATOL)
    np.testing.assert_allclose(ours_hidden, ref_hidden, rtol=RTOL, atol=ATOL)


def _semantic_bias(kw):
    v = kw["vocab_size"]
    bias = np.full(v, -np.inf, dtype=np.float32)
    bias[kw["semantic_begin_id"] : kw["semantic_end_id"] + 1] = 0.0
    bias[IM_END] = 0.0
    return bias


def _ref_greedy_decode(model, kw, inp, n_steps):
    """Greedy decode exactly per `inference.py:96-181` decode_one_token_ar,
    with argmax in place of multinomial sampling (temperature -> 0 limit)."""
    bias_t = torch.tensor(_semantic_bias(kw))
    t = inp.shape[-1]
    model.setup_caches(1, kw["max_seq_len"], dtype=torch.float32)
    with torch.no_grad():
        res = model.forward_generate(torch.tensor(inp), input_pos=torch.arange(t))
    out = []
    pos = t
    for _ in range(n_steps):
        main = int(torch.argmax(res.logits[0, -1] + bias_t))
        hidden = res.hidden_states[:, -1:]  # (1, 1, fast_dim), projected
        with torch.no_grad():
            # position 0: the projected hidden fills the fast cache; its
            # logits are discarded (inference.py:150-156)
            model.forward_generate_fast(hidden, torch.tensor([0]))
            a = int(np.clip(main - kw["semantic_begin_id"], 0,
                            kw["codebook_size"] - 1))
            codes = [a]
            h = model.fast_embeddings(torch.tensor([[a]]))
            for idx in range(1, kw["num_codebooks"]):
                fl = model.forward_generate_fast(h, torch.tensor([idx]))
                nxt = int(torch.argmax(fl[0, -1]))
                codes.append(nxt)
                h = model.fast_embeddings(torch.tensor([[nxt]]))
        column = np.array([main] + codes, dtype=np.int64)
        out.append(column)
        with torch.no_grad():
            res = model.forward_generate(
                torch.tensor(column[None, :, None]),
                input_pos=torch.tensor([pos]),
            )
        pos += 1
    return np.stack(out)  # (n_steps, C+1)


def _ours_greedy_decode(cfg, params, kw, inp, n_steps):
    """The same greedy decode through our prefill / decode_slow_step /
    fast_decode_step cache path."""
    bias = jnp.asarray(_semantic_bias(kw))
    t = inp.shape[-1]
    cache = dual_ar.init_kv_cache(cfg, 1, kw["max_seq_len"], dtype=jnp.float32)
    logits, hidden, cache = dual_ar.prefill(
        params, cfg, jnp.asarray(inp), cache, jnp.zeros((1,), jnp.int32),
        jnp.int32(t),
    )
    out = []
    pos = t
    for _ in range(n_steps):
        main = int(jnp.argmax(logits[0] + bias))
        x0 = dual_ar.fast_project_in(params, cfg, hidden)
        fast_cache = dual_ar.init_fast_kv_cache(cfg, 1, dtype=jnp.float32)
        _, fast_cache = dual_ar.fast_decode_step(
            params, cfg, x0, fast_cache, jnp.int32(0)
        )
        a = int(np.clip(main - kw["semantic_begin_id"], 0,
                        kw["codebook_size"] - 1))
        codes = [a]
        h = dual_ar.fast_embed(params, cfg, jnp.asarray([a]))
        for idx in range(1, kw["num_codebooks"]):
            fl, fast_cache = dual_ar.fast_decode_step(
                params, cfg, h, fast_cache, jnp.int32(idx)
            )
            nxt = int(jnp.argmax(fl[0]))
            codes.append(nxt)
            h = dual_ar.fast_embed(params, cfg, jnp.asarray([nxt]))
        column = np.array([main] + codes, dtype=np.int64)
        out.append(column)
        hidden, slow_out, cache = dual_ar.decode_slow_step(
            params, cfg, jnp.asarray(column[None]).astype(jnp.int32), cache,
            jnp.int32(pos),
        )
        logits = dual_ar._lm_head(params, cfg, slow_out[:, None])[:, 0]
        pos += 1
    return np.stack(out)


@pytest.mark.parametrize("kw", [PLAIN, QWEN3ISH], ids=["plain", "qwen3ish"])
def test_greedy_decode_token_equality(ref_llama, tmp_path, kw):
    """Token-exact greedy decode equality through both cache paths."""
    model = _build_ref_model(ref_llama, kw)
    cfg, params = _convert(model, tmp_path)

    t, n_steps = 16, 12
    inp = _random_inp(kw, 1, t)
    ref_tokens = _ref_greedy_decode(model, kw, inp, n_steps)
    ours_tokens = _ours_greedy_decode(cfg, params, kw, inp, n_steps)
    np.testing.assert_array_equal(ours_tokens, ref_tokens)


@pytest.mark.slow
def test_flagship_shape_parity(ref_llama, tmp_path):
    """The s2-pro structural layout (10 codebooks, GQA 4:1, projected fast
    stack) at reduced width: teacher-forced + greedy-decode parity."""
    kw = FLAGSHIP_SHAPE
    model = _build_ref_model(ref_llama, kw)
    cfg, params = _convert(model, tmp_path)

    b, t = 1, 32
    inp = _random_inp(kw, b, t)
    inp_t = torch.tensor(inp)
    with torch.no_grad():
        res = model.forward(
            inp_t, labels=inp_t,
            key_padding_mask=torch.zeros(b, t, dtype=torch.bool),
        )
    tok, cb = dual_ar.forward_train(params, cfg, jnp.asarray(inp), remat=False)
    np.testing.assert_allclose(np.asarray(tok), res.token_logits.numpy(),
                               rtol=RTOL, atol=5e-4)
    sem = (inp[:, 0] >= kw["semantic_begin_id"]) & (
        inp[:, 0] <= kw["semantic_end_id"]
    )
    np.testing.assert_allclose(np.asarray(cb)[sem],
                               res.codebook_logits.numpy(),
                               rtol=RTOL, atol=5e-4)

    ref_tokens = _ref_greedy_decode(model, kw, inp, 8)
    ours_tokens = _ours_greedy_decode(cfg, params, kw, inp, 8)
    np.testing.assert_array_equal(ours_tokens, ref_tokens)


def test_split_wqkv_conversion(ref_llama, tmp_path):
    """A checkpoint with split wq/wk/wv keys (the pre-fused layout that the
    reference fuses in its load hook, llama.py:877-882) converts to the same
    params as the fused layout."""
    model = _build_ref_model(ref_llama, PLAIN)
    cfg, params = _convert(model, tmp_path)

    state = {k: v.numpy() for k, v in model.state_dict().items()}
    kw = PLAIN
    q_size = kw["n_head"] * kw["head_dim"]
    kv_size = kw["n_local_heads"] * kw["head_dim"]
    split = {}
    for k, v in state.items():
        if k.endswith("attention.wqkv.weight"):
            base = k[: -len("wqkv.weight")]
            split[base + "wq.weight"] = v[:q_size]
            split[base + "wk.weight"] = v[q_size : q_size + kv_size]
            split[base + "wv.weight"] = v[q_size + kv_size :]
        else:
            split[k] = v
    params2 = convert_dual_ar(split, cfg)

    flat1 = jnp.asarray(params["layers"]["wqkv"])
    flat2 = jnp.asarray(params2["layers"]["wqkv"])
    np.testing.assert_array_equal(np.asarray(flat1), np.asarray(flat2))
