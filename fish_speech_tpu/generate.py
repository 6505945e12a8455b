"""Token-level generation runtime for the Dual-AR model.

TPU-first redesign of the reference generation loop
(`fish_speech/models/text2semantic/inference.py`):

  * prefill and decode are two `jax.jit` programs with bucketed static
    shapes (prompt padded up to a bucket; lengths masked);
  * the decode loop runs as `lax.scan` chunks of `decode_chunk_size` steps —
    the host only syncs once per chunk to check for `<|im_end|>` (this is
    also the streaming granularity);
  * sampling (top-p/top-k/temperature + RAS) happens on device inside the
    step, with the PRNG key threaded through the carry;
  * the constrained-decoding LM head is computed only over the semantic id
    range + im_end (identical values to full-logits + -inf bias);
  * the fast-AR inner loop is a `lax.scan` over the codebook axis with its
    (tiny) KV cache living in registers/VMEM for the whole step.

Sampling parameters (temperature/top_p/top_k) are traced values — changing
them never recompiles.
"""

from __future__ import annotations

import dataclasses
import functools
import re
import time
import warnings
from dataclasses import dataclass
from typing import Generator, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.config import DualARConfig, GenerateConfig, SamplingConfig
from fish_speech_tpu.models import dual_ar
from fish_speech_tpu.ops.sampling import (check_top_k, ras_select,
                                           sample_topk, topk_state)
from fish_speech_tpu.sequence import Conversation, Message, TextPart, VQPart
from fish_speech_tpu.tokenizer import FishTokenizer

PROMPT_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096, 8192)


def pick_bucket(t: int, max_seq: int) -> int:
    for b in PROMPT_BUCKETS:
        if t <= b and b <= max_seq:
            return b
    if t <= max_seq:
        return max_seq
    raise ValueError(f"Prompt length {t} exceeds max_seq_len {max_seq}")


# ---------------------------------------------------------------------------
# Device-side steps
# ---------------------------------------------------------------------------


class PrefixStore:
    """Host-side LRU of recent prompts' KV rows (voice-clone prefix cache).

    Shared by `GenerationSession` (batch-1) and `ContinuousBatcher` (group
    admission). Entries hold the prompt columns (for exact host-side
    prefix comparison) and the DEVICE cache rows sliced at store time
    (`(L, 1, bucket, ...)` per cache leaf).
    """

    def __init__(self, size: int):
        self.size = size
        self._store = {}  # key -> {"cols", "rows", "bucket"}
        self._order = []  # LRU
        self.hits = 0
        self.misses = 0

    def __len__(self):
        return len(self._store)

    def lookup(self, prompt: np.ndarray):
        """Longest usable common prefix with any stored prompt.

        Returns (m, rows) or None. The EXACT match length m is used (a
        traced scalar downstream, so no per-m compiles); `rows` is the
        entry's FULL stored bucket — positions >= m hold the other
        prompt's k/v, which is safe: the suffix prefill overwrites
        [m, t) and everything beyond a decode step's position is masked
        until that step overwrites it (the same invariant that makes the
        full-prefill bucket tail safe). m < t always, so at least one
        suffix column remains to prefill (it yields the first sample)."""
        t = prompt.shape[1]
        best_m, best_key = 0, None
        for key_, e in self._store.items():
            cols = e["cols"]
            n = min(cols.shape[1], t - 1)
            if n < 64:
                continue
            eq = (prompt[:, :n] == cols[:, :n]).all(axis=0)
            m = int(np.argmin(eq)) if not eq.all() else n
            if m > best_m:
                best_m, best_key = m, key_
        if best_m < 64 or best_key is None:
            return None
        self._order.remove(best_key)
        self._order.append(best_key)  # LRU refresh
        return best_m, self._store[best_key]["rows"]

    def accepts(self, prompt: np.ndarray) -> bool:
        """True if `store` would keep this prompt — check BEFORE slicing
        cache rows (each slice is a device op; on the TTFA hot path that
        is wasted dispatches for short or already-stored prompts)."""
        return (bool(self.size) and prompt.shape[1] >= 128
                and hash(prompt.tobytes()) not in self._store)

    def store(self, prompt: np.ndarray, rows: dict, bucket: int):
        """rows: cache leaves pre-sliced to (L, 1, bucket, ...)."""
        if not self.accepts(prompt):
            return
        key_ = hash(prompt.tobytes())
        self._store[key_] = {
            "cols": prompt.copy(), "rows": rows, "bucket": bucket,
        }
        self._order.append(key_)
        while len(self._order) > self.size:
            del self._store[self._order.pop(0)]


def _sample_column(params, cfg: DualARConfig, scfg: SamplingConfig, logits,
                   hidden, window, key, temperature, top_p, top_k):
    """Sample one full (C+1)-row token column given slow-head logits.

    Implements constrained sampling + RAS for the main token and the fast-AR
    loop for codebooks 1..C-1 (`inference.py:96-181`).
    """
    b = logits.shape[0]
    keys = jax.random.split(key, 4)

    if scfg.mask_im_end:  # benchmark-only, see SamplingConfig
        logits = logits.at[:, -1].set(-jnp.inf)

    # One top-k pass shared by the normal and RAS high-temperature samples.
    state = topk_state(logits)
    idx_normal = sample_topk(keys[0], state, temperature, top_p, top_k)
    tok_normal = dual_ar.semantic_index_to_token(cfg, idx_normal)
    if window is not None:
        idx_high = sample_topk(
            keys[1], state, scfg.ras_high_temp, scfg.ras_high_top_p, top_k
        )
        tok_high = dual_ar.semantic_index_to_token(cfg, idx_high)
        main = ras_select(
            tok_normal, tok_high, window, cfg.semantic_begin_id, cfg.semantic_end_id
        )
    else:
        main = tok_normal

    code0 = jnp.clip(main - cfg.semantic_begin_id, 0, cfg.codebook_size - 1)

    # Fast-AR over the codebook axis. The cache is tiny (seq len = C).
    fast_cache = dual_ar.init_fast_kv_cache(cfg, b, dtype=hidden.dtype)
    h0 = dual_ar.fast_project_in(params, cfg, hidden)
    _, fast_cache = dual_ar.fast_decode_step(
        params, cfg, h0, fast_cache, 0, with_logits=False
    )

    def fast_body(carry, i):
        prev_code, fc, k = carry
        x = dual_ar.fast_embed(params, cfg, prev_code)
        logits_i, fc = dual_ar.fast_decode_step(params, cfg, x, fc, i)
        k, sk = jax.random.split(k)
        code = sample_topk(sk, topk_state(logits_i), temperature, top_p, top_k)
        return (code, fc, k), code

    (_, _, _), rest = jax.lax.scan(
        fast_body,
        (code0, fast_cache, keys[2]),
        jnp.arange(1, cfg.num_codebooks),
    )  # rest: (C-1, B)

    column = jnp.concatenate(
        [main[None], code0[None], rest], axis=0
    ).T.astype(jnp.int32)  # (B, C+1)
    return column


def _restricted_logits(cfg: DualARConfig, logits_full):
    """Slice full-vocab logits down to the constrained-decoding head layout
    (semantic range + im_end; see `dual_ar.semantic_head_logits`)."""
    sb, se = cfg.semantic_begin_id, cfg.semantic_end_id
    return jnp.concatenate(
        [logits_full[:, sb : se + 1], logits_full[:, cfg.im_end_id][:, None]],
        axis=1,
    )


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(4,))
def prefill_step(params, cfg: DualARConfig, scfg: SamplingConfig, inp, cache,
                 offsets, t_end, key, temperature, top_p, top_k,
                 audio_features=None, audio_mask=None):
    """Prefill the cache from the prompt and sample the first column."""
    logits_full, hidden, cache = dual_ar.prefill(
        params, cfg, inp, cache, offsets, t_end,
        audio_features=audio_features, audio_mask=audio_mask,
    )
    # Use the restricted head for sampling, recomputed from the full-logit
    # slice to keep one code path with `semantic_head_logits`.
    logits = _restricted_logits(cfg, logits_full)
    column = _sample_column(
        params, cfg, scfg, logits, hidden, None, key, temperature, top_p, top_k
    )
    return column, cache


@functools.partial(jax.jit, static_argnums=(1, 2, 8), donate_argnums=(4,))
def prefill_suffix_step(params, cfg: DualARConfig, scfg: SamplingConfig,
                        inp_s, cache, rows, start_pos, t_end_s, kv_len,
                        key, temperature, top_p, top_k):
    """Restore stored prefix KV rows into the cache, prefill the prompt
    suffix over them, and sample the first column — ONE dispatch (each
    separate device call costs a full host round-trip through a remote-
    device tunnel). Prefix-caching hit path; see `dual_ar.prefill_suffix`."""
    cache = _restore_prefix_rows(cache, rows)
    logits_full, hidden, cache = dual_ar.prefill_suffix(
        params, cfg, inp_s, cache, start_pos, t_end_s, kv_len
    )
    logits = _restricted_logits(cfg, logits_full)
    column = _sample_column(
        params, cfg, scfg, logits, hidden, None, key, temperature, top_p, top_k
    )
    return column, cache


def _restore_prefix_rows(cache, rows):
    """Write stored prefix rows (any cache layout) back into a live cache.
    Rows are stored with batch 1 and broadcast onto all cache rows (the
    group-admission path restores one shared speaker prefix into k rows).
    Called inside the suffix-prefill jits (fused into their dispatch)."""
    out = {}
    for name in cache:
        r = rows[name]
        r = jnp.broadcast_to(r, r.shape[:1] + (cache[name].shape[1],)
                             + r.shape[2:])
        zeros = (0,) * cache[name].ndim
        out[name] = jax.lax.dynamic_update_slice(
            cache[name], r.astype(cache[name].dtype), zeros
        )
    return out


def _decode_one(params, cfg, scfg, token, cache, pos, window, key,
                temperature, top_p, top_k, kv_valid=None, kv_len=None):
    hidden, slow_out, cache = dual_ar.decode_slow_step(
        params, cfg, token, cache, pos, kv_valid=kv_valid, kv_len=kv_len
    )
    logits = dual_ar.semantic_head_logits(params, cfg, slow_out)
    key, sk = jax.random.split(key)
    column = _sample_column(
        params, cfg, scfg, logits, hidden, window, sk, temperature, top_p, top_k
    )
    return column, cache, key


@functools.partial(
    jax.jit, static_argnums=(1, 2, 3, 13), donate_argnums=(5,)
)
def decode_chunk(params, cfg: DualARConfig, scfg: SamplingConfig, n_steps: int,
                 token, cache, pos, window, key, temperature, top_p, top_k,
                 kv_offsets=None, kv_len=None):
    """Run n_steps decode steps on device; host syncs once per chunk.

    Returns (columns (n, B, C+1), token, cache, pos, window, key, done (B,)).
    Steps continue past im_end (outputs are truncated host-side); the KV
    writes past im_end are harmless because every batch re-prefills from
    position 0.
    """

    kv_valid = kv_offsets

    def body(carry, _):
        token, cache, pos, window, key = carry
        column, cache, key = _decode_one(
            params, cfg, scfg, token, cache, pos, window, key,
            temperature, top_p, top_k, kv_valid=kv_valid, kv_len=kv_len,
        )
        window = jnp.roll(window, -1, axis=1).at[:, -1].set(column[:, 0])
        return (column, cache, pos + 1, window, key), column

    (token, cache, pos, window, key), cols = jax.lax.scan(
        body, (token, cache, pos, window, key), None, length=n_steps
    )
    done = jnp.any(cols[:, :, 0] == cfg.im_end_id, axis=0)
    return cols, token, cache, pos, window, key, done


# ---------------------------------------------------------------------------
# Continuous-batching device steps (per-row positions / keys / params)
# ---------------------------------------------------------------------------


def _sample_column_rows(params, cfg, scfg, logits, hidden, window, keys,
                        temperature, top_p, top_k, active):
    """Per-row keyed variant of _sample_column for the decode pool."""
    from fish_speech_tpu.ops.sampling import sample_topk_rows, split_keys_rows

    b = logits.shape[0]
    ks = split_keys_rows(keys, 4)  # (B, 4, 2)

    if scfg.mask_im_end:  # benchmark-only, see SamplingConfig — must hold
        # in EVERY sampling path (the pool's rows included), or a
        # "sustained" run silently early-stops rows
        logits = logits.at[:, -1].set(-jnp.inf)

    state = topk_state(logits)
    idx_normal = sample_topk_rows(ks[:, 0], state, temperature, top_p, top_k)
    tok_normal = dual_ar.semantic_index_to_token(cfg, idx_normal)
    idx_high = sample_topk_rows(
        ks[:, 1], state, scfg.ras_high_temp, scfg.ras_high_top_p, top_k
    )
    tok_high = dual_ar.semantic_index_to_token(cfg, idx_high)
    main = ras_select(
        tok_normal, tok_high, window, cfg.semantic_begin_id, cfg.semantic_end_id
    )
    code0 = jnp.clip(main - cfg.semantic_begin_id, 0, cfg.codebook_size - 1)

    fast_cache = dual_ar.init_fast_kv_cache(cfg, b, dtype=hidden.dtype)
    h0 = dual_ar.fast_project_in(params, cfg, hidden)
    _, fast_cache = dual_ar.fast_decode_step(
        params, cfg, h0, fast_cache, 0, with_logits=False
    )

    def fast_body(carry, i):
        prev_code, fc, k = carry
        x = dual_ar.fast_embed(params, cfg, prev_code)
        logits_i, fc = dual_ar.fast_decode_step(params, cfg, x, fc, i)
        ksplit = split_keys_rows(k, 2)
        code = sample_topk_rows(
            ksplit[:, 0], topk_state(logits_i), temperature, top_p, top_k
        )
        return (code, fc, ksplit[:, 1]), code

    (_, _, _), rest = jax.lax.scan(
        fast_body, (code0, fast_cache, ks[:, 2]),
        jnp.arange(1, cfg.num_codebooks),
    )
    column = jnp.concatenate(
        [main[None], code0[None], rest], axis=0
    ).T.astype(jnp.int32)
    return column, ks[:, 3]


@functools.partial(
    jax.jit, static_argnums=(1, 2, 3, 13), donate_argnums=(5,)
)
def decode_chunk_multi(params, cfg: DualARConfig, scfg: SamplingConfig,
                       n_steps: int, token, cache, pos, window, keys, active,
                       temperature, top_p, top_k, kv_len=None):
    """Continuous-batching decode: every row advances its OWN position and
    carries its own PRNG key and sampling params; inactive rows are frozen
    (no KV writes, no position advance — pure wasted lanes, which is the
    point: weight reads are shared by whoever is active).

    Returns (cols (n, B, C+1), token, cache, pos, window, keys, active).
    A row deactivates itself when it emits im_end.
    """

    def body(carry, _):
        token, cache, pos, window, keys, active = carry
        hidden, slow_out, cache = dual_ar.decode_slow_step_multi(
            params, cfg, token, cache, pos, active, kv_len=kv_len
        )
        logits = dual_ar.semantic_head_logits(params, cfg, slow_out)
        column, keys = _sample_column_rows(
            params, cfg, scfg, logits, hidden, window, keys,
            temperature, top_p, top_k, active,
        )
        emitted = jnp.where(active[:, None], column, token)
        window = jnp.where(
            active[:, None],
            jnp.roll(window, -1, axis=1).at[:, -1].set(column[:, 0]),
            window,
        )
        still = active & (column[:, 0] != cfg.im_end_id)
        pos = pos + active.astype(pos.dtype)
        token = jnp.where(active[:, None], column, token)
        return (token, cache, pos, window, keys, still), emitted

    (token, cache, pos, window, keys, active), cols = jax.lax.scan(
        body, (token, cache, pos, window, keys, active), None, length=n_steps
    )
    return cols, token, cache, pos, window, keys, active


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(4, 5))
def prefill_single_into_pool(params, cfg: DualARConfig, scfg: SamplingConfig,
                             inp, pool, scratch, slot, length, key,
                             temperature, top_p, top_k):
    """Prefill one request (B=1) into `scratch`, then insert into pool slot.

    Returns (first_column (1, C+1), pool, scratch).
    """
    logits_full, hidden, scratch = dual_ar.prefill(
        params, cfg, inp, scratch, jnp.zeros((1,), jnp.int32), length
    )
    logits = _restricted_logits(cfg, logits_full)
    column = _sample_column(
        params, cfg, scfg, logits, hidden, None, key, temperature, top_p, top_k
    )
    pool = dual_ar.insert_cache_slot(pool, scratch, slot)
    return column, pool, scratch


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(4, 5))
def prefill_group_into_pool(params, cfg: DualARConfig, scfg: SamplingConfig,
                            inp, pool, scratch, rows, t_ends, keys,
                            temperature, top_p, top_k):
    """Prefill a GROUP of k requests in one pass and scatter their caches
    into pool rows `rows`.

    Amortizes the admission cost under bursty arrivals: the reference
    delegates this to SGLang's batched prefill (README.md:130-137); here it
    is first-party. Prompts are right-aligned at [0, t_ends[i]) inside a
    shared bucket (inp (k, C+1, bucket)) — with per-row positions, the plain
    causal mask already isolates rows (see dual_ar.prefill). `scratch` is a
    (L, k, bucket, H, D) cache donated across calls of the same (k, bucket).

    Returns (first_columns (k, C+1), next_keys (k, 2), pool, scratch).
    """
    k = inp.shape[0]
    logits_full, hidden, scratch = dual_ar.prefill(
        params, cfg, inp, scratch, jnp.zeros((k,), jnp.int32), t_ends
    )
    logits = _restricted_logits(cfg, logits_full)
    window = jnp.zeros((k, scfg.ras_win_size), jnp.int32)  # empty -> no RAS
    column, next_keys = _sample_column_rows(
        params, cfg, scfg, logits, hidden, window, keys,
        temperature, top_p, top_k, None,
    )
    pool = dual_ar.insert_cache_rows(pool, scratch, rows)
    return column, next_keys, pool, scratch


@functools.partial(jax.jit, static_argnums=(1, 2))
def prefill_group_parked(params, cfg: DualARConfig, scfg: SamplingConfig,
                         inp, scratch, t_ends, keys, temperature, top_p,
                         top_k):
    """Group prefill WITHOUT a pool slot: the burst-admission path.

    When the decode pool is fully occupied, arriving requests are still
    prefilled (so their first frame streams back immediately) and their
    caches PARKED; freed slots later receive the parked rows via
    `insert_parked_rows` without re-running the prefill. `scratch` is a
    fresh (L, k, bucket, H, D) cache owned by the parked entry afterwards
    (NOT donated: it must outlive this call).

    Returns (first_columns (k, C+1), next_keys (k, 2), cache).
    """
    k = inp.shape[0]
    logits_full, hidden, scratch = dual_ar.prefill(
        params, cfg, inp, scratch, jnp.zeros((k,), jnp.int32), t_ends
    )
    logits = _restricted_logits(cfg, logits_full)
    window = jnp.zeros((k, scfg.ras_win_size), jnp.int32)
    column, next_keys = _sample_column_rows(
        params, cfg, scfg, logits, hidden, window, keys,
        temperature, top_p, top_k, None,
    )
    return column, next_keys, scratch


@functools.partial(jax.jit, static_argnums=(1, 2, 8))
def prefill_group_parked_suffix(params, cfg: DualARConfig,
                                scfg: SamplingConfig, inp_s, scratch, rows,
                                start_pos, t_ends_s, kv_len, keys,
                                temperature, top_p, top_k):
    """Group admission over a shared prompt prefix: restore the stored
    speaker-prefix KV rows into every scratch row, prefill only each
    request's suffix (per-row real lengths t_ends_s), and sample first
    columns — one dispatch, like `prefill_group_parked` but reading the
    prefix from the cache instead of recomputing it."""
    k = inp_s.shape[0]
    scratch = _restore_prefix_rows(scratch, rows)
    logits_full, hidden, scratch = dual_ar.prefill_suffix(
        params, cfg, inp_s, scratch, start_pos, t_ends_s, kv_len
    )
    logits = _restricted_logits(cfg, logits_full)
    window = jnp.zeros((k, scfg.ras_win_size), jnp.int32)
    column, next_keys = _sample_column_rows(
        params, cfg, scfg, logits, hidden, window, keys,
        temperature, top_p, top_k, None,
    )
    return column, next_keys, scratch


@functools.partial(jax.jit, donate_argnums=(0,))
def scatter_parked_rows(pool, parked_cache, src_idx, rows, take):
    """Move parked cache rows into pool rows in-place (donated pool) with a
    FIXED-SHAPE signature: src_idx/rows/take are all pool-sized, `rows` is
    a permutation of the pool rows, and pool row rows[i] receives parked
    row src_idx[i] only where take[i]. One compile per (pool, parked-k,
    bucket) triple regardless of how many rows an admission moves — and a
    take=False call is a value-preserving no-op, so every signature can be
    precompiled safely at any time (admission latency must never depend on
    which group sizes a bursty arrival race happened to produce)."""
    s = parked_cache["k"].shape[2]

    def upd(pool_arr, parked_arr):
        sel = parked_arr[:, src_idx].astype(pool_arr.dtype)  # (L,P,s,...)
        cur = pool_arr[:, rows, :s]
        t = take.reshape((1, -1) + (1,) * (pool_arr.ndim - 2))
        return pool_arr.at[:, rows, :s].set(jnp.where(t, sel, cur))

    # generic over cache layout: plain {k, v} or int8 {k, v, ks, vs}
    return {name: upd(pool[name], parked_cache[name]) for name in pool}


# ---------------------------------------------------------------------------
# Host-side generation driver
# ---------------------------------------------------------------------------


class StreamPartial:
    """A cumulative (C+1, n) column matrix that is still ON DEVICE.

    Yielded by `generate_stream(device_partials=True)` BEFORE any host
    sync, so a streaming consumer can dispatch downstream device work
    (codec decode) pipelined behind the LM step instead of paying a host
    round-trip first — the mechanism behind sub-200 ms first audio
    through a remote-device tunnel. `host()` fetches (and caches) the
    values; `valid_frames()` additionally applies the im_end / budget
    trim that the host path applies before yielding. The device array may
    overshoot: it always contains whole decode chunks.
    """

    def __init__(self, device_cols, im_end_id: int, max_cols: int):
        self.device_cols = device_cols  # (C+1, n) cumulative, untrimmed
        self._im_end_id = im_end_id
        self._max_cols = max_cols
        self._host = None
        try:  # start the transfer early; harmless if unsupported
            device_cols.copy_to_host_async()
        except Exception:
            pass

    def host(self) -> np.ndarray:
        if self._host is None:
            self._host = np.asarray(self.device_cols)
        return self._host

    def valid_frames(self) -> int:
        """Number of leading columns that are real frames: stops BEFORE
        the first im_end and never exceeds the generation budget."""
        cols = self.host()
        n = min(cols.shape[1], self._max_cols)
        ends = np.flatnonzero(cols[0, :n] == self._im_end_id)
        return int(ends[0]) if len(ends) else n


@dataclass
class GenerateResponse:
    action: str  # "sample" | "next" | "partial"
    codes: Optional[np.ndarray] = None
    text: Optional[str] = None
    # device-partial streaming (see StreamPartial): codes is a jax array
    # and valid_frames() must be consulted before emitting audio
    valid_frames: Optional[object] = None


class GenerationSession:
    """Owns the KV cache and compiled step functions for one model."""

    def __init__(self, params, cfg: DualARConfig, scfg: SamplingConfig = None,
                 max_batch: int = 1, dtype=jnp.bfloat16,
                 decode_chunk_size: int = 32, kv_buckets=(512, 1024, 2048),
                 first_chunk_size: int = 0, pipeline_lookahead: int = 1,
                 fuse_ffn: Optional[bool] = None, kv_quant: bool = False,
                 prefix_cache_size: int = 0):
        # Inference-only augmentations (checkpoint save/training never see
        # these): pre-slice the restricted LM head so the decode scan reads
        # it directly instead of re-slicing the full head every frame, and
        # fuse each layer's w1|w3 into one w13 matmul. Fusion default is
        # AUTO: single-stream only — the concat materializes a second copy
        # of the FFN weights (+2.1 GB on the int8 flagship while the caller
        # still holds the originals), which OOMs the 16 GB chip at serving
        # batch x 2048-context KV; at batch 1 there is ample headroom and
        # the ~0.3 ms/frame win matters most. Skipped for multi-device
        # params (naive concat would interleave tp shards wrong).
        self.params = dual_ar.precompute_semantic_head(params, cfg)
        if fuse_ffn is None:
            fuse_ffn = max_batch == 1
        if fuse_ffn and not dual_ar.is_multidevice(params):
            self.params = dual_ar.fuse_ffn_weights(self.params)
        self.cfg = cfg.resolve()
        self.scfg = scfg or SamplingConfig()
        self.dtype = dtype
        self.decode_chunk_size = decode_chunk_size
        # streaming latency: optionally run a smaller first chunk so the
        # first audio segment reaches the codec sooner (one extra compile)
        self.first_chunk_size = first_chunk_size or decode_chunk_size
        # Dispatch-ahead depth for non-streaming generation: with 0, the
        # host reads a chunk's outputs before dispatching the next one, so
        # the device idles one host round-trip per chunk (~100 ms through a
        # remote-device tunnel). With k>0, up to k+1 chunks are in flight
        # and the device runs back-to-back; on early im_end up to k chunks
        # of device work are wasted. Streaming keeps 0 so per-chunk codec
        # decodes don't queue behind an in-flight LM chunk.
        self.pipeline_lookahead = pipeline_lookahead
        # headroom so chunked decode never writes past the buffer
        self.cache_len = self.cfg.max_seq_len + decode_chunk_size
        self.param_bytes = sum(
            x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)
        )
        # attention reads only a bucketed prefix of the cache (each distinct
        # bucket is one extra compile; KV reads dominate long-cache decode)
        self.kv_buckets = tuple(
            sorted(b for b in kv_buckets if b < self.cache_len)
        ) + (self.cache_len,)
        # int8 KV cache (per-position-per-head absmax scales): halves the
        # decode-time KV reads that rival weight reads at large batch x
        # context; prefill stays exact (fresh-KV attention). Opt-in.
        self.kv_quant = kv_quant
        self.cache = dual_ar.init_kv_cache(
            self.cfg, max_batch, self.cache_len, dtype, quant=kv_quant
        )
        # Voice-clone prefix caching (radix-cache-style, one level): keep
        # the KV rows of the last N distinct prompts; a new prompt sharing
        # a long prefix (same speaker reference / system framing) restores
        # those rows and prefills only its suffix. Causality makes any
        # common prefix reusable: k/v at position j depend only on tokens
        # 0..j. 0 disables (default — keeps benchmarks comparable);
        # batch-1 only. ~(bucket(t) * 36*8*128*2*2) bytes/entry on the
        # flagship (~150 MB at bucket 1024).
        self.prefix_cache_size = prefix_cache_size if max_batch == 1 else 0
        self.prefix = PrefixStore(self.prefix_cache_size)
        # AOT executables from precompile(), keyed by exact dispatch
        # signature. Dispatching THROUGH these (instead of the jit path)
        # matters on a remote device: the jit dispatch deserializes the
        # persistent-cache entry into a fresh loaded executable, and that
        # load stalled 35-370 s server-side across a whole evening of
        # measurements — while executing the precompiled AOT object, same
        # program, same minute, took 0.0 s. Exact-signature hits use the
        # AOT object; everything else falls back to the jit path.
        self._aot = {}

    def _prefill(self, inp, cache, offsets, t_end, key, temperature, top_p,
                 top_k, feats=None, mask=None):
        """Dispatch one prefill: AOT executable on exact signature match,
        jit otherwise (see `_aot`)."""
        b, _, bucket = inp.shape
        sig = ("prefill", b, bucket)
        fn = self._aot.get(sig) if feats is None else None
        if fn is not None:
            try:
                return fn(self.params, inp, cache, offsets, t_end, key,
                          temperature, top_p, top_k, None, None)
            except (TypeError, ValueError) as e:
                # operand aval/pytree drift (cache-layout or quant change
                # since precompile): stay correct via jit, and EVICT the
                # stale entry so later chunks skip the failing AOT retry
                # (and its per-chunk warning) entirely
                del self._aot[sig]
                warnings.warn(f"AOT prefill evicted, fell back to jit: {e}")
        return prefill_step(self.params, self.cfg, self.scfg, inp, cache,
                            offsets, t_end, key, temperature, top_p, top_k,
                            feats, mask)

    def _decode(self, n, token, cache, pos, window, key, temperature,
                top_p, top_k, kv_offsets, kv_len):
        """Dispatch one decode chunk: AOT on exact signature match, jit
        otherwise (see `_aot`)."""
        b = token.shape[0]
        sig = ("decode", b, int(n), int(kv_len), kv_offsets is not None)
        fn = self._aot.get(sig)
        if fn is not None:
            try:
                return fn(self.params, token, cache, pos, window, key,
                          temperature, top_p, top_k, kv_offsets)
            except (TypeError, ValueError) as e:
                del self._aot[sig]  # stale entry: one warning, then jit
                warnings.warn(f"AOT decode evicted, fell back to jit: {e}")
        return decode_chunk(self.params, self.cfg, self.scfg, int(n), token,
                            cache, pos, window, key, temperature, top_p,
                            top_k, kv_offsets, int(kv_len))

    def _kv_bucket(self, pos_end: int) -> int:
        for b in self.kv_buckets:
            if pos_end <= b:
                return b
        return self.cache_len

    def decode_signatures(self, t_start: int, budget: int,
                          first_chunk: Optional[int] = None):
        """The (n_steps, kv_len) decode signatures a run starting at
        position `t_start` with `budget` new tokens dispatches (mirrors
        the host loops in generate_stream / generate_batch)."""
        sigs = []
        pos, left = t_start, budget - 1
        n = int(first_chunk or self.first_chunk_size)
        while left > 0:
            sig = (n, self._kv_bucket(pos + n + 1))
            if sig not in sigs:
                sigs.append(sig)
            pos += n
            left -= n
            n = self.decode_chunk_size
        return sigs

    def precompile(self, prompt_len: int, max_new_tokens: int = 0,
                   batch: Optional[int] = None,
                   first_chunk: Optional[int] = None,
                   execute: bool = True) -> dict:
        """AOT-compile every jit program a generate/generate_batch run will
        dispatch, in PARALLEL threads, then execute each once.

        Cold compile of the serving programs is the dominant startup cost
        (prefill + the 64-step decode scan compile SERIALLY inside the
        first generate: measured 117.6 s on a cache-cold driver machine).
        `jax.jit.lower(...).compile()` builds the same HLO the real call
        dispatches, so with the persistent compilation cache enabled the
        real call's compile step becomes a cache hit — and independent
        programs compile concurrently here instead of back-to-back. The
        big operands (cache) are passed as ShapeDtypeStructs: no second
        KV allocation. Returns {name: seconds}.

        execute=True additionally runs each compiled program ONCE on
        value-irrelevant operands ("execute" entry in the returned times).
        Compiling is not enough on a remote device: the server
        materializes/loads a program at its FIRST execution, and that load
        measured 35-240 s for the serving prefill when it landed inside
        the first real generate (the stall reproduced with every compile
        cache hitting — it is a program-load cost, not a compile cost).
        Executing here absorbs the load inside precompile, so the first
        real request pays dispatch + compute only. The session cache is
        donated through the warm-up chain exactly as real calls donate it;
        its contents become garbage, which is safe — every generate
        prefills the rows it reads from scratch.

        CONTRACT: execute=True must run BEFORE or BETWEEN generations —
        never while a generate/generate_batch is mid-stream or while
        prefix caching holds live KV rows you intend to reuse. The warm-up
        chain donates (garbage-fills) the live session cache and
        reallocates it when `batch` differs from the current cache, so a
        mid-session call silently destroys device state a concurrent
        consumer depends on. All current callers (server startup, bench)
        satisfy this; a second batch signature should be precompiled with
        execute=False or between requests.
        """
        cfg, scfg = self.cfg, self.scfg
        b = int(batch or self.cache["k"].shape[1])
        bucket = min(pick_bucket(prompt_len, self.cache_len), cfg.max_seq_len)
        budget = (max_new_tokens
                  if max_new_tokens and prompt_len + max_new_tokens <= cfg.max_seq_len
                  else cfg.max_seq_len - prompt_len)

        cache_abs = jax.eval_shape(
            lambda: dual_ar.init_kv_cache(cfg, b, self.cache_len, self.dtype,
                                          quant=self.kv_quant)
        )
        inp = jnp.zeros((b, cfg.num_codebooks + 1, bucket), jnp.int32)
        offsets = jnp.zeros((b,), jnp.int32)
        key = jax.random.PRNGKey(0)
        temperature, top_p, top_k = (jnp.float32(0.8), jnp.float32(0.8),
                                     jnp.int32(30))
        token = jnp.zeros((b, cfg.num_codebooks + 1), jnp.int32)
        pos = jnp.int32(prompt_len)
        window = jnp.zeros((b, scfg.ras_win_size), jnp.int32)
        kv_offsets = offsets if b > 1 else None

        jobs = {
            f"prefill_{bucket}": lambda: prefill_step.lower(
                self.params, cfg, scfg, inp, cache_abs, offsets,
                jnp.int32(prompt_len), key, temperature, top_p, top_k,
                None, None,
            ).compile()
        }
        # mirror the dispatch sites exactly: generate_batch (b > 1) defaults
        # its first chunk to decode_chunk_size, generate_stream (b == 1) to
        # the session's first_chunk_size
        if first_chunk is None and b > 1:
            first_chunk = self.decode_chunk_size
        sigs = self.decode_signatures(prompt_len, budget, first_chunk)
        for n, kv_len in sigs:
            jobs[f"decode_{n}@{kv_len}"] = (
                lambda n=n, kv_len=kv_len: decode_chunk.lower(
                    self.params, cfg, scfg, n, token, cache_abs, pos,
                    window, key, temperature, top_p, top_k, kv_offsets,
                    kv_len,
                ).compile()
            )

        import concurrent.futures

        times = {}
        compiled = {}

        def run(name, fn):
            t0 = time.perf_counter()
            compiled[name] = fn()
            times[name] = round(time.perf_counter() - t0, 1)

        with concurrent.futures.ThreadPoolExecutor(len(jobs)) as ex:
            futs = [ex.submit(run, name, fn) for name, fn in jobs.items()]
            for f in futs:
                f.result()

        # register for AOT dispatch (see __init__._aot)
        self._aot[("prefill", b, bucket)] = compiled[f"prefill_{bucket}"]
        for n, kv_len in sigs:
            self._aot[("decode", b, n, kv_len, kv_offsets is not None)] = (
                compiled[f"decode_{n}@{kv_len}"]
            )

        if execute:
            # One warm-up execution per program (see docstring). Serial:
            # every program donates the SAME session cache, threaded
            # through the chain like a real run.
            t0 = time.perf_counter()
            if self.cache["k"].shape[1] != b:
                self.cache = dual_ar.init_kv_cache(
                    cfg, b, self.cache_len, self.dtype, quant=self.kv_quant
                )
            out = compiled[f"prefill_{bucket}"](
                self.params, inp, self.cache, offsets,
                jnp.int32(prompt_len), key, temperature, top_p, top_k,
                None, None,
            )
            self.cache = out[1]
            # Wait via a HOST FETCH of fresh outputs (column / cols), not
            # block_until_ready: through the remote-device tunnel
            # block_until_ready was observed returning immediately
            # ('execute': 0.0 while the chain demonstrably costs ~3 s),
            # which defers the server's program-materialization stall to
            # the first real request — the exact thing this warm-up
            # exists to absorb. A device-to-host fetch cannot complete
            # without the server having finished the chain; the arrays
            # are tiny (one (B, C+1) column per program).
            fresh = [out[0]]
            for n, kv_len in sigs:
                res = compiled[f"decode_{n}@{kv_len}"](
                    self.params, token, self.cache, pos, window, key,
                    temperature, top_p, top_k, kv_offsets,
                )
                self.cache = res[2]
                fresh.append(res[0])
            jax.device_get(fresh)
            times["execute"] = round(time.perf_counter() - t0, 1)
        return times

    # -- voice-clone prefix cache (see __init__ and PrefixStore) --------

    @property
    def prefix_hits(self):
        return self.prefix.hits

    @property
    def prefix_misses(self):
        return self.prefix.misses

    def generate(
        self,
        prompt: np.ndarray,  # (C+1, T) int32
        key,
        max_new_tokens: int = 0,
        temperature: float = 1.0,
        top_p: float = 0.9,
        top_k: int = 30,
        audio_features: Optional[np.ndarray] = None,  # (T, F) prompt-aligned
        audio_mask: Optional[np.ndarray] = None,  # (T,) bool
    ) -> np.ndarray:
        """Generate until im_end or the token budget; returns (C+1, N) numpy
        columns including the final im_end column (parity with
        `inference.py:241-359`).

        audio_features/audio_mask: optional continuous conditioning aligned
        with the prompt (`ContentSequence.align_audio_features`); requires a
        model with `audio_feature_dim > 0`."""
        last = None
        for last in self.generate_stream(
            prompt, key, max_new_tokens=max_new_tokens,
            temperature=temperature, top_p=top_p, top_k=top_k,
            audio_features=audio_features, audio_mask=audio_mask,
            pipeline_lookahead=self.pipeline_lookahead,
        ):
            pass
        return last

    def generate_stream(
        self,
        prompt: np.ndarray,  # (C+1, T) int32
        key,
        max_new_tokens: int = 0,
        temperature: float = 1.0,
        top_p: float = 0.9,
        top_k: int = 30,
        audio_features: Optional[np.ndarray] = None,
        audio_mask: Optional[np.ndarray] = None,
        pipeline_lookahead: int = 0,
        device_partials: bool = False,
    ):
        """Streaming variant of `generate`: yields the CUMULATIVE (C+1, n)
        columns after the prefill frame and after every decode chunk (the
        last yield is the complete sequence). Drives per-decode-chunk audio
        streaming in the TTS engine — sub-second first audio instead of
        waiting for the whole text segment.

        pipeline_lookahead > 0 dispatches that many decode chunks beyond
        the one being read (positions are tracked host-side so no device
        sync gates a dispatch): the device runs chunks back-to-back and the
        per-chunk host round-trip disappears from the critical path.
        Defaults to 0 here because a streaming consumer typically enqueues
        codec work between yields, which must not queue behind an in-flight
        LM chunk; `generate()` (no consumer between chunks) passes the
        session's lookahead."""
        cfg, scfg = self.cfg, self.scfg
        check_top_k(top_k)
        t = prompt.shape[1]
        if t >= cfg.max_seq_len:
            raise ValueError(
                f"Input sequence length {t} exceeds max_seq_len {cfg.max_seq_len}"
            )
        if max_new_tokens and t + max_new_tokens <= cfg.max_seq_len:
            budget = max_new_tokens
        else:
            budget = cfg.max_seq_len - t

        # clamp to max_seq_len: the rope table is sized to it, and an odd
        # (non-bucket) max_seq_len would otherwise pick a larger bucket
        bucket = min(pick_bucket(t, self.cache_len), cfg.max_seq_len)
        inp = np.zeros((1, cfg.num_codebooks + 1, bucket), dtype=np.int32)
        inp[0, :, :t] = prompt
        offsets = jnp.zeros((1,), dtype=jnp.int32)

        temperature = jnp.float32(temperature)
        top_p = jnp.float32(top_p)
        top_k = jnp.int32(top_k)

        feats = mask = None
        if audio_features is not None:
            feats_np = np.zeros(
                (1, bucket, audio_features.shape[-1]), dtype=np.float32
            )
            feats_np[0, :t] = audio_features
            mask_np = np.zeros((1, bucket), dtype=bool)
            mask_np[0, :t] = audio_mask
            feats, mask = jnp.asarray(feats_np), jnp.asarray(mask_np)

        key, pk = jax.random.split(key)
        pre = None
        if self.prefix_cache_size and feats is None:
            pre = self.prefix.lookup(prompt)
        if pre is not None:
            m, rows = pre
            ts = t - m
            sbucket = pick_bucket(ts, self.cache_len)
            if m + sbucket > self.cache_len:
                pre = None  # suffix pad tail would overrun the cache
        if pre is not None:
            self.prefix.hits += 1
            inp_s = np.zeros((1, cfg.num_codebooks + 1, sbucket), np.int32)
            inp_s[0, :, :ts] = prompt[:, m:]
            kv_len = self._kv_bucket(m + sbucket)
            column, self.cache = prefill_suffix_step(
                self.params, cfg, scfg, jnp.asarray(inp_s), self.cache,
                rows, jnp.int32(m), jnp.int32(ts), kv_len, pk,
                temperature, top_p, top_k,
            )
        else:
            self.prefix.misses += 1
            column, self.cache = self._prefill(
                jnp.asarray(inp), self.cache, offsets,
                jnp.int32(t), pk, temperature, top_p, top_k, feats, mask,
            )
            if (self.prefix_cache_size and feats is None
                    and self.prefix.accepts(prompt)):
                rows = {name: arr[:, :, :bucket]
                        for name, arr in self.cache.items()}
                self.prefix.store(prompt, rows, bucket)
        if device_partials:
            yield from self._stream_device(
                column, t, budget, key, temperature, top_p, top_k
            )
            return
        columns = [np.asarray(column)]  # list of (B, C+1)
        yield np.concatenate(columns, axis=0).T
        if int(column[0, 0]) == cfg.im_end_id:
            return

        pos = jnp.int32(t)
        pos_host = t  # mirrors `pos` so dispatch never syncs on the device
        token = column
        window = jnp.zeros((1, scfg.ras_win_size), jnp.int32)
        dispatch_left = budget - 1  # steps not yet dispatched
        emit_left = budget - 1  # steps not yet yielded
        first = True
        inflight = []  # [(cols_device, n)] — FIFO of dispatched chunks
        while dispatch_left > 0 or inflight:
            while dispatch_left > 0 and len(inflight) <= pipeline_lookahead:
                # Always run a FULL chunk (n_steps is a static jit arg;
                # variable trailing chunks would each recompile) and truncate
                # host-side. The cache has decode_chunk_size slots of
                # headroom so the overshoot never writes out of bounds.
                n = self.first_chunk_size if first else self.decode_chunk_size
                first = False
                kv_len = self._kv_bucket(pos_host + n + 1)
                cols, token, self.cache, pos, window, key, _ = self._decode(
                    int(n), token, self.cache, pos,
                    window, key, temperature, top_p, top_k, None, kv_len,
                )
                inflight.append((cols, n))
                pos_host += n
                dispatch_left -= n
            cols_dev, n = inflight.pop(0)
            cols = np.asarray(cols_dev)[:, 0][: max(emit_left, 0)]  # (<=n, C+1)
            emit_left -= n
            ends = cols[:, 0] == cfg.im_end_id
            if ends.any():
                # Any still-inflight chunks past im_end are discarded (bounded
                # by pipeline_lookahead chunks of wasted device work).
                stop = int(np.argmax(ends))
                columns.append(cols[: stop + 1])
                yield np.concatenate(columns, axis=0).T
                return
            columns.append(cols)
            yield np.concatenate(columns, axis=0).T

    def _stream_device(self, column, t, budget, key, temperature, top_p,
                       top_k):
        """Device-resident streaming: yields StreamPartial objects BEFORE
        any host sync so the consumer can pipeline codec work behind the
        LM step (the sub-200 ms TTFA path). Host checks for im_end happen
        after the consumer resumes, reusing the partial's cached fetch.
        Yields whole chunks untrimmed; consumers apply valid_frames()."""
        cfg, scfg = self.cfg, self.scfg
        cum = column.T  # (C+1, 1) device
        partial = StreamPartial(cum, cfg.im_end_id, budget)
        yield partial
        if int(partial.host()[0, -1]) == cfg.im_end_id:
            return

        pos = jnp.int32(t)
        pos_host = t
        token = column
        window = jnp.zeros((1, scfg.ras_win_size), jnp.int32)
        dispatch_left = budget - 1
        first = True
        while dispatch_left > 0:
            n = self.first_chunk_size if first else self.decode_chunk_size
            first = False
            kv_len = self._kv_bucket(pos_host + n + 1)
            cols, token, self.cache, pos, window, key, _ = self._decode(
                int(n), token, self.cache, pos,
                window, key, temperature, top_p, top_k, None, kv_len,
            )
            cum = jnp.concatenate([cum, cols[:, 0, :].T], axis=1)
            pos_host += n
            dispatch_left -= n
            partial = StreamPartial(cum, cfg.im_end_id, budget)
            yield partial
            if (partial.host()[0] == cfg.im_end_id).any():
                return

    def generate_batch(
        self,
        prompts,  # list of (C+1, T_i) int32
        key,
        max_new_tokens: int = 0,
        temperature: float = 1.0,
        top_p: float = 0.9,
        top_k: int = 30,
        first_chunk_size: Optional[int] = None,
    ):
        """Batched generation: B prompts decode in lockstep, sharing every
        weight read (the single-stream decode is HBM-bandwidth-bound, so
        aggregate throughput scales nearly linearly with B until compute
        binds). Returns a list of (C+1, N_i) arrays, each truncated at its
        own im_end.

        first_chunk_size: optional smaller FIRST decode chunk (the streaming
        ramp `generate_stream` applies by default) so the first audio-worth
        of columns returns after prefill + a short chunk instead of a full
        one; steady-state chunks stay at decode_chunk_size. Costs one extra
        dispatch per generation (use for latency-sensitive batches).
        """
        cfg, scfg = self.cfg, self.scfg
        check_top_k(top_k)
        b = len(prompts)
        lens = [p.shape[1] for p in prompts]
        t_max = max(lens)
        if t_max >= cfg.max_seq_len:
            raise ValueError(f"Longest prompt {t_max} exceeds max_seq_len")
        budget = (
            max_new_tokens
            if max_new_tokens and t_max + max_new_tokens <= cfg.max_seq_len
            else cfg.max_seq_len - t_max
        )

        bucket = min(pick_bucket(t_max, self.cache_len), cfg.max_seq_len)
        inp = np.zeros((b, cfg.num_codebooks + 1, bucket), dtype=np.int32)
        offsets_np = np.asarray([t_max - l for l in lens], dtype=np.int32)
        for i, p in enumerate(prompts):
            inp[i, :, offsets_np[i] : t_max] = p
        offsets = jnp.asarray(offsets_np)

        if self.cache["k"].shape[1] != b:
            self.cache = dual_ar.init_kv_cache(
                cfg, b, self.cache_len, self.dtype, quant=self.kv_quant
            )

        temperature = jnp.float32(temperature)
        top_p = jnp.float32(top_p)
        top_k = jnp.int32(top_k)

        key, pk = jax.random.split(key)
        column, self.cache = self._prefill(
            jnp.asarray(inp), self.cache, offsets,
            jnp.int32(t_max), pk, temperature, top_p, top_k,
        )
        # Lockstep batch: prompts are LEFT-aligned to a common end (t_max),
        # so RoPE relative distances stay exact within each row; the per-row
        # pad region [0, offsets[i]) is masked out of decode attention.
        columns = [np.asarray(column)]  # (B, C+1) each
        token = column
        pos = jnp.int32(t_max)
        window = jnp.zeros((b, scfg.ras_win_size), jnp.int32)
        done = np.asarray(column[:, 0] == cfg.im_end_id)

        steps_left = budget - 1
        chunk = int(first_chunk_size or self.decode_chunk_size)
        while steps_left > 0 and not done.all():
            kv_len = self._kv_bucket(int(pos) + chunk + 1)
            cols, token, self.cache, pos, window, key, _ = self._decode(
                chunk, token,
                self.cache, pos, window, key, temperature, top_p, top_k,
                offsets, kv_len,
            )
            cols = np.asarray(cols)[: max(steps_left, 0)]  # (n, B, C+1)
            steps_left -= chunk
            columns.extend(cols)
            done = done | (cols[:, :, 0] == cfg.im_end_id).any(axis=0)
            chunk = int(self.decode_chunk_size)

        stacked = np.stack(columns, axis=0)  # (N, B, C+1)
        outputs = []
        for i in range(b):
            main = stacked[:, i, 0]
            ends = np.nonzero(main == cfg.im_end_id)[0]
            n = int(ends[0]) + 1 if len(ends) else stacked.shape[0]
            outputs.append(np.ascontiguousarray(stacked[:n, i].T))
        return outputs


# ---------------------------------------------------------------------------
# Text chunking (`inference.py:454-520`)
# ---------------------------------------------------------------------------

_SPEAKER_PATTERN = r"(<\|speaker:\d+\|>)"


def split_text_by_speaker(text: str) -> List[str]:
    parts = re.split(_SPEAKER_PATTERN, text)
    turns = []
    i = 0
    while i < len(parts):
        part = parts[i].strip()
        if re.match(_SPEAKER_PATTERN, part):
            if i + 1 < len(parts):
                turns.append((part + parts[i + 1]).strip())
                i += 2
            else:
                turns.append(part)
                i += 1
        else:
            i += 1
    return turns


def group_turns_into_batches(
    turns: List[str], max_speakers: int = 5, max_bytes: int = 300
) -> List[str]:
    batches: List[str] = []
    current: List[str] = []
    current_bytes = 0
    for turn in turns:
        turn_bytes = len(turn.encode("utf-8"))
        if len(current) >= max_speakers or (
            current and current_bytes + turn_bytes > max_bytes
        ):
            batches.append("\n".join(current))
            current = [turn]
            current_bytes = turn_bytes
        else:
            current.append(turn)
            current_bytes += turn_bytes
    if current:
        batches.append("\n".join(current))
    return batches


# ---------------------------------------------------------------------------
# Long-form generation with conversation carry (`inference.py:523-733`)
# ---------------------------------------------------------------------------

SYSTEM_PROMPT_CLONE = (
    "convert the provided text to speech reference to the following:\n\nText:\n"
)
SYSTEM_PROMPT_PLAIN = "convert the provided text to speech"


def build_base_conversation(
    prompt_text: Optional[List[str]],
    prompt_tokens: Optional[List[np.ndarray]],
) -> Conversation:
    """System message for voice cloning (reference texts + VQ codes) or plain
    TTS (`inference.py:564-598`)."""
    conv = Conversation()
    use_prompt = bool(prompt_text) and prompt_tokens is not None and len(prompt_tokens)
    if use_prompt:
        tagged = []
        for i, t in enumerate(prompt_text):
            if not re.search(_SPEAKER_PATTERN, t):
                tagged.append(f"<|speaker:{i}|>{t}")
            else:
                tagged.append(t)
        parts = [
            TextPart(text=SYSTEM_PROMPT_CLONE, cal_loss=False),
            TextPart(text="\n".join(tagged), cal_loss=False),
            TextPart(text="\n\nSpeech:\n", cal_loss=False),
            VQPart(codes=np.concatenate(prompt_tokens, axis=1), cal_loss=False),
        ]
    else:
        parts = [TextPart(text=SYSTEM_PROMPT_PLAIN, cal_loss=False)]
    conv.append(
        Message(role="system", parts=parts, cal_loss=False,
                add_im_start=True, add_im_end=True)
    )
    return conv


def generate_long(
    *,
    session: GenerationSession,
    tokenizer: FishTokenizer,
    text: str,
    num_samples: int = 1,
    max_new_tokens: int = 0,
    top_p: float = 0.9,
    top_k: int = 30,
    temperature: float = 1.0,
    chunk_length: int = 300,
    max_speakers: int = 5,
    prompt_text: Optional[Union[str, List[str]]] = None,
    prompt_tokens: Optional[Union[np.ndarray, List[np.ndarray]]] = None,
    seed: int = 42,
    logger=None,
    stream_partials: bool = False,
    device_partials: bool = False,
    cancel_check=None,
) -> Generator[GenerateResponse, None, None]:
    """Chunked long-form generation: split text on speaker tags, batch turns,
    generate sequentially, carrying generated codes forward as conversation
    context so later chunks condition on earlier audio.

    stream_partials: additionally yield action="partial" responses with the
    CUMULATIVE codes of the in-progress segment after every decode chunk
    (sub-second first audio; the reference streams only whole segments,
    `inference.py:485-520`). The closing action="sample" repeats the full
    segment codes as before.

    device_partials (with stream_partials): partial responses carry the
    cumulative codes as DEVICE arrays yielded before any host sync, plus a
    `valid_frames` callable that fetches/trims; a codec consumer dispatches
    its decode pipelined behind the LM step (the low-TTFA path).

    cancel_check: optional () -> bool polled between decode chunks (and
    between text segments); returning True abandons generation early — the
    serving path wires a client-disconnect event here so a dropped request
    stops consuming device time at chunk granularity."""
    assert 0 < top_p <= 1, "top_p must be in (0, 1]"
    assert 0 < temperature < 2, "temperature must be in (0, 2)"

    # normalized poll for every guard site; branch SELECTION still keys on
    # `cancel_check is not None` because the uncancellable non-streaming
    # path deliberately avoids per-chunk host transfers
    cancelled = cancel_check if cancel_check is not None else (lambda: False)

    cfg = session.cfg
    if isinstance(prompt_text, str):
        prompt_text = [prompt_text]
    if isinstance(prompt_tokens, np.ndarray):
        prompt_tokens = [prompt_tokens]
    if prompt_text and prompt_tokens and len(prompt_text) != len(prompt_tokens):
        raise ValueError("Prompt text and tokens must have the same length")

    base_conversation = build_base_conversation(prompt_text, prompt_tokens)

    turns = split_text_by_speaker(text)
    if turns:
        batches = group_turns_into_batches(
            turns, max_speakers=max_speakers, max_bytes=chunk_length
        )
    else:
        batches = [text]

    key = jax.random.PRNGKey(seed)

    for sample_idx in range(num_samples):
        conversation = Conversation(list(base_conversation.messages))

        for batch_text in batches:
            conversation.append(
                Message(role="user", parts=[TextPart(text=batch_text)],
                        cal_loss=False, add_im_start=True, add_im_end=True)
            )
            gen_conv = Conversation(list(conversation.messages))
            gen_conv.append(
                Message(role="assistant", parts=[], cal_loss=False,
                        modality="voice", add_im_start=True, add_im_end=False)
            )
            encoded, _, _ = gen_conv.encode_for_inference(
                tokenizer, num_codebooks=cfg.num_codebooks
            )
            if encoded.shape[1] > cfg.max_seq_len - 2048 and cfg.max_seq_len > 2048:
                raise ValueError(
                    f"Prompt is too long: {encoded.shape[1]} > "
                    f"{cfg.max_seq_len - 2048}"
                )

            t0 = time.perf_counter()
            key, gk = jax.random.split(key)
            if cancelled():
                return
            if stream_partials and device_partials:
                last = None
                for last in session.generate_stream(
                    encoded, gk, max_new_tokens=max_new_tokens,
                    temperature=temperature, top_p=top_p, top_k=top_k,
                    device_partials=True,
                ):
                    if cancelled():
                        return
                    yield GenerateResponse(
                        action="partial",
                        codes=last.device_cols[1:],
                        text=batch_text,
                        valid_frames=last.valid_frames,
                    )
                # reconstruct the trimmed host sequence (incl. a trailing
                # im_end column if present) to match the host path's `seq`
                host = last.host()
                valid = last.valid_frames()
                has_end = (
                    valid < host.shape[1]
                    and int(host[0, valid]) == cfg.im_end_id
                )
                seq = host[:, : valid + 1 if has_end else valid]
            elif stream_partials:
                seq = None
                for seq in session.generate_stream(
                    encoded, gk, max_new_tokens=max_new_tokens,
                    temperature=temperature, top_p=top_p, top_k=top_k,
                ):
                    if cancelled():
                        return
                    n_p = seq.shape[1]
                    end_p = (
                        n_p - 1
                        if n_p and int(seq[0, -1]) == cfg.im_end_id
                        else n_p
                    )
                    if end_p > 0:
                        yield GenerateResponse(
                            action="partial",
                            codes=np.ascontiguousarray(seq[1:, :end_p]),
                            text=batch_text,
                        )
            elif cancel_check is not None:
                # non-streaming but cancellable: drive the chunked stream
                # (the exact loop session.generate runs) so the poll fires
                # between decode chunks, not only between text segments
                seq = None
                for seq in session.generate_stream(
                    encoded, gk, max_new_tokens=max_new_tokens,
                    temperature=temperature, top_p=top_p, top_k=top_k,
                    pipeline_lookahead=getattr(session, "pipeline_lookahead", 0),
                ):
                    if cancelled():
                        return
            else:
                seq = session.generate(
                    encoded, gk, max_new_tokens=max_new_tokens,
                    temperature=temperature, top_p=top_p, top_k=top_k,
                )
            dt = time.perf_counter() - t0
            if logger is not None:
                tok_s = seq.shape[1] / max(dt, 1e-9)
                # user-facing perf lines matching the reference's
                # tokens/sec + model-bandwidth report (inference.py:693-705)
                logger.info(
                    "Generated %d columns in %.2fs (%.1f tok/s, %.1f GB/s, "
                    "RTF %.3f)",
                    seq.shape[1], dt, tok_s,
                    getattr(session, "param_bytes", 0) * tok_s / 1e9,
                    21.5332 / max(tok_s, 1e-9),
                )

            # Drop the trailing im_end column; keep codebook rows.
            n = seq.shape[1]
            end = n - 1 if int(seq[0, -1]) == cfg.im_end_id else n
            codes = np.ascontiguousarray(seq[1:, :end])
            assert (codes >= 0).all(), "Negative code generated"

            conversation.append(
                Message(role="assistant",
                        parts=[VQPart(codes=codes, cal_loss=False)],
                        cal_loss=False, modality="voice",
                        add_im_start=True, add_im_end=True)
            )
            yield GenerateResponse(action="sample", codes=codes, text=batch_text)

        yield GenerateResponse(action="next")
