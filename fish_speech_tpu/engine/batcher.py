"""Continuous batching: a fixed pool of decode slots shared by concurrent
requests. The reference never solved this in-repo (its server is strictly
batch-1 behind a queue, `inference.py:748-799`; continuous batching was
delegated to external SGLang). Here it is first-class:

  * a worker thread owns the device state: a pooled KV cache
    (L, POOL, S, Hkv, Dh) plus per-slot host state;
  * new requests prefill into a scratch cache (bucketed compile) and are
    inserted into free slots between decode sub-chunks: long chunks are
    dispatched as PIPELINED sub-chunks (`admit_every` steps, two in
    flight so the device runs back-to-back while fetches ride under
    device time) and an arrival interrupts dispatch after at most ~one
    in-flight sub-chunk — its admission prefill launches WHILE the
    in-flight sub-chunks still run, so the pipeline never drains
    (`_run_chunk`); bursty arrivals are prefilled in GROUPS (one batched
    right-aligned prefill per prompt bucket, group sizes in {16,4,1})
    dispatched TWO-PHASE: every group enqueues before any group's
    columns are fetched, so a burst's admissions run back-to-back on
    the device (`_prefill_dispatch`/`_prefill_finalize`);
  * when the pool is FULL, overflow requests are still prefilled into
    PARKED device caches (all groups up to the parked-row budget,
    front-loaded; parked rows bounded by 2x pool_size): their first
    frame streams back immediately, and freed slots later receive parked
    rows via one in-place gather+scatter — no re-prefill. Measured cold
    bursts: 32 clients / 16-slot pool first-chunk p50 0.368 s; 32 / 32
    p50 0.408 s; open-loop Poisson arrivals p50 0.16-0.19 s up to
    8 req/s offered;
  * every iteration runs one jitted `decode_chunk_multi` over the whole
    pool — each slot has its own position, RNG key, RAS window and sampling
    params; inactive slots are frozen lanes;
  * each generated chunk's columns are routed to per-request queues
    (streaming-friendly);
  * a slot retires on its own im_end or its token budget.

Single-stream latency cost: decode shares weight reads with all active
slots, so per-stream latency degrades only marginally while aggregate
throughput scales ~linearly until compute binds (the decode is
HBM-bandwidth-bound).
"""

from __future__ import annotations

import functools
import os
import queue
import sys
import threading
import time as _time
import warnings

_DEBUG = bool(os.environ.get("FS_BATCHER_DEBUG"))
_T0 = _time.perf_counter()


def _dbg(msg: str):
    if _DEBUG:
        print(f"[batcher +{_time.perf_counter()-_T0:8.3f}s] {msg}",
              file=sys.stderr, flush=True)
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.config import DualARConfig, SamplingConfig
from fish_speech_tpu.ops.sampling import check_top_k
from fish_speech_tpu.generate import (
    PROMPT_BUCKETS,
    PrefixStore,
    decode_chunk_multi,
    pick_bucket,
    prefill_group_parked,
    prefill_group_parked_suffix,
    scatter_parked_rows,
)
from fish_speech_tpu.models import dual_ar


@jax.jit
def _seed_keys(seeds):
    """Per-request sampling keys from integer seeds (one device call per
    admission group). Matches the old per-request derivation:
    split(PRNGKey(seed))[1]."""
    return jax.vmap(
        lambda s: jax.random.split(jax.random.PRNGKey(s))[1]
    )(seeds)


@functools.partial(jax.jit, donate_argnums=(0, 2, 3, 5, 6, 7))
def _apply_admission(token, pos, window, keys, active, temperature, top_p,
                     top_k, mask, n_token, n_pos, n_keys, n_temp, n_top_p,
                     n_top_k):
    """Fold newly admitted rows into the pool's device state in ONE
    fixed-shape jitted call (all args are full-pool-sized, so this compiles
    exactly once; eager per-row scatters would recompile per distinct
    admission-group size — seconds each through this remote compiler).

    `pos` (1) and `active` (4) are deliberately NOT donated: the worker's
    overlapped admission (`_run_chunk.interrupt`) runs this while decode
    sub-chunks are still in flight, and each in-flight entry holds the
    pos/active handles of ITS dispatch for emission bookkeeping — donating
    them here deletes the buffers under those entries ("Array has been
    deleted"). They are pool-sized vectors; the copy is noise."""
    m1 = mask[:, None]
    return (
        jnp.where(m1, n_token, token),
        jnp.where(mask, n_pos, pos),
        jnp.where(m1, 0, window),
        jnp.where(m1, n_keys, keys),
        active | mask,
        jnp.where(mask, n_temp, temperature),
        jnp.where(mask, n_top_p, top_p),
        jnp.where(mask, n_top_k, top_k),
    )


@dataclass
class _Slot:
    active: bool = False
    request: Optional["BatchRequest"] = None
    pos: int = 0
    budget_left: int = 0


@dataclass
class _Parked:
    """A prefilled-but-not-yet-scheduled admission group (burst overflow).

    The group's KV cache lives on device; its requests already received
    their first frame. Rows move into freed pool slots via
    `insert_parked_rows` without re-prefilling.
    """

    cache: dict  # (L, ksig, bucket, H, D)
    reqs: List["BatchRequest"]
    t_ends: np.ndarray
    cols: np.ndarray  # (k, C+1) first sampled columns
    nkeys: np.ndarray  # (k, 2)
    alive: List[bool]
    rows_alloc: int  # ALLOCATED cache rows (>= len(reqs): padded signature)

    def pending_rows(self) -> List[int]:
        return [i for i, a in enumerate(self.alive) if a]


def _alloc_rows(k: int) -> int:
    """Cache rows a k-request admission group actually allocates: the
    nearest precompiled prefill signature {1, 4, 16} at or above k."""
    return k if k in (1, 4, 16) else (4 if k < 4 else 16)


@dataclass
class BatchRequest:
    prompt: np.ndarray  # (C+1, T)
    max_new_tokens: int = 0
    temperature: float = 0.8
    top_p: float = 0.8
    top_k: int = 30
    seed: int = 42
    # output stream: np arrays of shape (n, C+1) per chunk, then None
    out: "queue.Queue" = field(default_factory=queue.Queue)
    # client-gone signal: the worker reaps the request at the next chunk
    # boundary (slot freed, queue terminated) instead of decoding the rest
    # of the budget for nobody
    cancelled: threading.Event = field(default_factory=threading.Event)


class BatcherSession:
    """GenerationSession-compatible facade over a ContinuousBatcher, so the
    TTS engine / generate_long drive the shared decode pool unchanged.
    `concurrent = True` tells the engine not to serialize requests."""

    concurrent = True

    def __init__(self, batcher: "ContinuousBatcher"):
        self.batcher = batcher
        self.cfg = batcher.cfg
        self.scfg = batcher.scfg

    @staticmethod
    def _seed_of(key):
        k = np.asarray(key).reshape(-1)
        return int(k[0] ^ (k[-1] << 1)) & 0x7FFFFFFF

    def generate(self, prompt, key, max_new_tokens=0, temperature=1.0,
                 top_p=0.9, top_k=30, **_):
        return self.batcher.generate(
            prompt, max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, top_k=top_k, seed=self._seed_of(key),
        )

    def generate_stream(self, prompt, key, max_new_tokens=0, temperature=1.0,
                        top_p=0.9, top_k=30, **_):
        """Yield CUMULATIVE (C+1, n) columns as the pool emits this
        request's chunks (same contract as GenerationSession.generate_stream).

        Closing the generator early (consumer gone: HTTP client dropped,
        engine-level cancel) marks the request cancelled so the pool frees
        its slot at the next chunk boundary instead of decoding the rest of
        the budget for nobody."""
        req = BatchRequest(
            prompt=prompt, max_new_tokens=max_new_tokens,
            temperature=temperature, top_p=top_p, top_k=top_k,
            seed=self._seed_of(key),
        )
        out = self.batcher.submit(req)
        chunks = []
        done = False
        try:
            while True:
                item = out.get()
                if item is None:
                    done = True
                    break
                if isinstance(item, BaseException):
                    done = True
                    raise RuntimeError("batcher worker failed") from item
                chunks.append(item)
                yield np.concatenate(chunks, axis=0).T
            if not chunks:
                yield np.zeros((self.cfg.num_codebooks + 1, 0), np.int32)
        finally:
            if not done:
                req.cancelled.set()
                self.batcher._wake.set()


class ContinuousBatcher:
    def __init__(self, params, cfg: DualARConfig, scfg: SamplingConfig = None,
                 pool_size: int = 4, dtype=jnp.bfloat16,
                 decode_chunk_size: int = 16, first_chunk_size: int = 0,
                 idle_sleep: float = 0.002, kv_quant: bool = False,
                 prefix_cache_size: int = 0, admit_every: int = 4):
        from fish_speech_tpu.models.dual_ar import precompute_semantic_head

        # pre-sliced restricted head (see GenerationSession). No w13 fusion
        # here: the pool always decodes batched (weight reads amortize) and
        # the fused copy's +2.1 GB HBM would crowd the pool KV cache.
        self.params = precompute_semantic_head(params, cfg)
        self.cfg = cfg.resolve()
        self.scfg = scfg or SamplingConfig()
        self.dtype = dtype
        self.pool_size = pool_size
        self.chunk = decode_chunk_size
        self.first_chunk = first_chunk_size or decode_chunk_size
        # pipelined sub-chunk length (`_run_chunk`): admission-wait bound
        # ~2 sub-chunks; 0 = monolithic chunks (the pre-round-5 behavior)
        if admit_every < 0:
            # a negative value would make _chunk_plan return an empty plan
            # and the worker busy-spin with admitted streams never decoding
            raise ValueError(f"admit_every must be >= 0, got {admit_every}")
        self.admit_every = admit_every
        self.idle_sleep = idle_sleep
        self.cache_len = self.cfg.max_seq_len + decode_chunk_size
        self.kv_buckets = tuple(
            b for b in (512, 2048) if b < self.cache_len
        ) + (self.cache_len,)

        b = pool_size
        # voice-clone prefix caching across admissions: when every request
        # in an admission group shares a stored >=64-column prompt prefix
        # (a same-speaker burst), the group prefill restores that prefix's
        # KV into all rows and runs only the per-request suffixes.
        self.prefix = PrefixStore(prefix_cache_size)
        self.kv_quant = kv_quant
        self.pool = dual_ar.init_kv_cache(self.cfg, b, self.cache_len, dtype,
                                          quant=kv_quant)
        self.token = jnp.zeros((b, self.cfg.num_codebooks + 1), jnp.int32)
        self.pos = jnp.zeros((b,), jnp.int32)
        self.window = jnp.zeros((b, self.scfg.ras_win_size), jnp.int32)
        self.keys = jnp.zeros((b, 2), jnp.uint32)
        self.active = jnp.zeros((b,), bool)
        self.temperature = jnp.full((b,), 0.8, jnp.float32)
        self.top_p = jnp.full((b,), 0.8, jnp.float32)
        self.top_k = jnp.full((b,), 30, jnp.int32)

        self.slots: List[_Slot] = [_Slot() for _ in range(b)]
        # burst overflow: prefilled admission groups waiting for slots
        # (bounded device memory: at most park_max_rows parked KV rows)
        self.parked: List[_Parked] = []
        self._worker_error: Optional[BaseException] = None
        # HARD bound on ALLOCATED parked cache rows (a partially-drained
        # or padded entry holds its full ksig-row cache until it drains).
        # 2x pool: parked rows live at prompt-sized buckets (64-1024),
        # far smaller than the pool's full-context rows, so this stays
        # well under the pool's own KV footprint — and matches the
        # worst-case ceiling the old pending-row accounting could
        # silently reach via padded caches, now enforced instead.
        self.park_max_rows = 2 * pool_size
        self._overflow: List[BatchRequest] = []  # FIFO, drained from pending
        self._compiled_buckets = set()
        # AOT executables from precompile(), keyed by exact dispatch
        # signature — same mechanism as GenerationSession._aot. Dispatching
        # the worker loop THROUGH these matters on a remote device: the jit
        # dispatch loads a fresh server-side executable even for an
        # already-compiled program (measured 10.3 s first jit execution vs
        # 0.34 s through the AOT object for the same program), so a
        # jit-dispatched first pool decode could re-pay the very
        # materialization stall precompile(execute=True) absorbed.
        self._aot = {}
        self.pending: "queue.Queue[BatchRequest]" = queue.Queue()
        self._stop = threading.Event()
        self._wake = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    # -- public api --

    def submit(self, request: BatchRequest) -> "queue.Queue":
        """Queue a request; returns its output queue ((n, C+1) arrays,
        terminated by None — or by the worker's exception object if it
        crashed, which consumers re-raise)."""
        check_top_k(request.top_k)
        if self._worker_error is not None or not self.thread.is_alive():
            # dead worker: fail fast instead of enqueueing to a queue
            # nobody will ever drain (the client would block forever)
            request.out.put(self._worker_error
                            or RuntimeError("batcher worker is not running"))
            return request.out
        self.pending.put(request)
        self._wake.set()
        return request.out

    def generate(self, prompt: np.ndarray, **kw) -> np.ndarray:
        """Blocking convenience wrapper -> (C+1, N) columns incl. im_end."""
        req = BatchRequest(prompt=prompt, **kw)
        out = self.submit(req)
        chunks = []
        while True:
            item = out.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise RuntimeError("batcher worker failed") from item
            chunks.append(item)
        if not chunks:
            return np.zeros((self.cfg.num_codebooks + 1, 0), np.int32)
        return np.concatenate(chunks, axis=0).T

    def stats(self) -> dict:
        """Point-in-time pool observability (served by /v1/metrics).
        Reads are unsynchronized snapshots — fine for metrics."""
        parked = list(self.parked)
        return {
            "pool_size": self.pool_size,
            "active_slots": sum(1 for s in self.slots if s.active),
            "queued": self.pending.qsize() + len(self._overflow),
            "parked_rows": sum(len(pk.pending_rows()) for pk in parked),
            "worker_alive": self.thread.is_alive(),
        }

    def shutdown(self):
        self._stop.set()
        self._wake.set()
        self.thread.join(timeout=10)

    # -- worker --

    def _drain_pending(self):
        while True:
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                return
            if req.prompt.shape[1] >= self.cfg.max_seq_len:
                req.out.put(None)
                continue
            self._overflow.append(req)

    def _reap_cancelled(self):
        """Free resources of requests whose client is gone: active slots
        (pool row deactivated), queued overflow, and parked rows. Each
        reaped queue is terminated with None. Runs in the worker thread at
        every admission pass, so a cancel takes effect within one chunk."""
        for i, s in enumerate(self.slots):
            if s.active and s.request is not None and s.request.cancelled.is_set():
                _dbg(f"reap_slot {i}")
                s.request.out.put(None)
                s.active = False
                s.request = None
                self.active = self.active.at[i].set(False)
        if self._overflow:
            keep = []
            for req in self._overflow:
                if req.cancelled.is_set():
                    req.out.put(None)
                else:
                    keep.append(req)
            self._overflow = keep
        for pk in self.parked:
            for j, req in enumerate(pk.reqs):
                if pk.alive[j] and req.cancelled.is_set():
                    pk.alive[j] = False
                    req.out.put(None)
        self.parked = [pk for pk in self.parked if pk.pending_rows()]

    def _request_budget(self, req: "BatchRequest", t: int) -> int:
        cfg = self.cfg
        if req.max_new_tokens and t + req.max_new_tokens <= cfg.max_seq_len:
            return req.max_new_tokens
        return cfg.max_seq_len - t

    def _admit(self):
        """Admit requests into free slots; park burst overflow.

        Admissions are PREFILLED IN GROUPS (one batched prefill per prompt
        bucket, group sizes planned by `_group_plan` to bound the
        compile count): under bursty arrivals, N single-row prefills would
        otherwise serialize against the pool decode and dominate wall time.
        The per-request sampling key depends only on the request seed, so
        outputs are independent of how admissions happen to be grouped.

        When the pool is FULL, overflow requests are still prefilled into
        PARKED device caches (all groups up to the parked-row budget,
        front-loaded) so every client receives its first frame promptly;
        freed slots then receive parked rows without re-prefilling. FIFO
        order is preserved: parked groups predate everything in the
        overflow list. Both admission sites run TWO-PHASE: every group's
        prefill is enqueued before any group's columns are fetched, so a
        cold burst's admission prefills execute back-to-back on the
        device (round 5; previously each group paid a fetch + emission
        pass before the next group dispatched). Transient memory while
        staged: direct admission's scratch caches are bounded by the
        pool's row count x the prompt bucket, parking by park_max_rows —
        the same bounds the serial design had live at once, plus at most
        one group's cache of overlap.
        """
        self._drain_pending()
        self._reap_cancelled()
        free = [i for i, s in enumerate(self.slots) if not s.active]
        admitted = False

        # 1. freed slots first go to parked rows (oldest requests)
        while free and self.parked:
            pk = self.parked[0]
            avail = pk.pending_rows()
            m = min(len(free), len(avail))
            m = next(g for g in (16, 4, 1) if g <= m)
            idxs, rows = avail[:m], free[:m]
            free = free[m:]
            _dbg(f"activate_parked m={m} rows={rows}")
            self._activate_parked(pk, idxs, rows)
            admitted = True
            if not pk.pending_rows():
                self.parked.pop(0)

        # 2. direct admission into remaining free slots (only when no
        #    parked rows remain — they are older). Unified with the parked
        #    path: prefill the group (first frames stream immediately),
        #    then activate into free rows with the fixed-shape scatter.
        if free and not self.parked and self._overflow:
            batch = self._overflow[: len(free)]
            del self._overflow[: len(batch)]
            by_bucket = {}
            for req in batch:
                b = pick_bucket(req.prompt.shape[1], self.cache_len)
                by_bucket.setdefault(b, []).append(req)
            # two-phase: enqueue EVERY group's prefill first (device runs
            # them back-to-back), then fetch+emit+activate in FIFO order —
            # group i's tunnel fetch rides under group i+1's device time
            # instead of serializing a cold burst's admissions
            staged = []
            for bucket, reqs in sorted(by_bucket.items()):
                i = 0
                for k in self._group_plan(len(reqs)):
                    # compiled signatures stay {16, 4, 1} per bucket;
                    # 2-3-request groups ride the padded 4-signature
                    # (see _prefill_parked) instead of serializing as
                    # singles — mixed-length bursts produce many pairs
                    group = reqs[i : i + k]
                    i += k
                    _dbg(f"admit_group k={k} bucket={bucket}")
                    staged.append(self._prefill_dispatch(bucket, group))
            for st in staged:
                pk = self._prefill_finalize(st)
                if pk is not None:
                    avail = pk.pending_rows()
                    rows = free[: len(avail)]
                    free = free[len(avail):]
                    self._activate_parked(pk, avail, rows)
                _dbg("admit_group done")
            admitted = True

        # 3. park overflow groups up to the parked-row budget — ALL of
        #    them, not one per pass. Round 3 parked one group per call "to
        #    interleave with decode chunks", but the chunks between parks
        #    were full 64-step dispatches (~0.9 s each on the flagship), so
        #    in a cold mixed burst the LAST class's first audio trailed at
        #    2.53 s (VERDICT r3 item 6). Front-loading the prefills costs
        #    the in-flight streams one burst of admission work right when
        #    their buffers are freshest (first chunks just delivered), and
        #    FIFO park order still prefills cheap short-prompt groups
        #    before the big voice-clone buckets. Budget counts ALLOCATED
        #    cache rows (a padded 2-3-request group owns a 4-row cache), so
        #    parked device memory stays bounded by park_max_rows regardless
        #    of fragmentation.
        parked_rows = sum(pk.rows_alloc for pk in self.parked)
        staged = []
        while self._overflow and parked_rows < self.park_max_rows:
            n_overflow = len(self._overflow)
            bucket, reqs = self._select_park_group(
                self.park_max_rows - parked_rows)
            if len(self._overflow) == n_overflow:
                break  # no progress at all (defensive; cannot recur)
            staged.append(self._prefill_dispatch(bucket, reqs))
            # budget counts ALLOCATED rows at dispatch time; a group that
            # dies instantly at its prefill frame frees its rows on the
            # next admission pass (one pass more conservative than the
            # serial design, never over budget)
            parked_rows += _alloc_rows(len(reqs))
        for st in staged:
            pk = self._prefill_finalize(st)
            if pk is not None:
                self.parked.append(pk)
            _dbg("park_group done")

        return admitted

    def _group_plan(self, n: int):
        """Split n same-bucket requests into admission-group sizes.

        Greedy {16, 4} (bounded by pool size — only those signatures are
        precompiled per bucket), then the 1-3 remainder as ONE group: a
        2-3-request group dispatches through the padded 4-signature inside
        `_prefill_parked`, halving the dispatch count for the pairs that
        mixed-length bursts produce."""
        cap = max(self.pool_size, 1)
        sizes = []
        for g in (16, 4):
            if g <= cap:
                while n >= g:
                    sizes.append(g)
                    n -= g
        if n:
            if n > 1 and 4 <= cap:
                sizes.append(n)  # padded to the 4-signature
            else:
                sizes.extend([1] * n)
        return sizes

    def _select_park_group(self, max_rows: int):
        """Pick one overflow group to park (host-only selection; the
        prefill dispatch happens separately so a burst's groups can
        pipeline on the device).

        The group gathers the oldest request's BUCKET across the whole
        overflow list (not just its contiguous prefix): interleaved
        mixed-length arrivals would otherwise degrade every group to a
        single row. Per-bucket FIFO is preserved; other buckets wait at
        most one group. Returns (bucket, reqs) with the reqs removed
        from the overflow list."""
        bucket = pick_bucket(self._overflow[0].prompt.shape[1], self.cache_len)
        cap = min(16, max_rows, max(self.pool_size, 1))
        run_idx = [
            i for i, req in enumerate(self._overflow)
            if pick_bucket(req.prompt.shape[1], self.cache_len) == bucket
        ][:cap]
        k = self._group_plan(len(run_idx))[0]
        if _alloc_rows(k) > max_rows:
            # the padded signature would overshoot the remaining parked-row
            # budget (e.g. a 2-request group riding the 4-signature with
            # only 2 rows left); shrink to the largest size that fits
            k = max(g for g in (16, 4, 1) if g <= max_rows)
        reqs = [self._overflow[i] for i in run_idx[:k]]
        for i in reversed(run_idx[:k]):
            del self._overflow[i]
        _dbg(f"park_group k={k} bucket={bucket}")
        return bucket, reqs

    def _prefill_parked(self, bucket: int, reqs) -> Optional[_Parked]:
        """Group-prefill `reqs` (first frames stream back immediately) and
        return the parked entry, or None if nothing survives (instant
        im_end / exhausted budget). Used by BOTH direct admission (rows
        activate right away) and burst overflow (rows activate when slots
        free). One-group convenience over dispatch+finalize; multi-group
        admissions call the phases directly so group i+1's prefill
        executes while group i's columns cross the tunnel."""
        return self._prefill_finalize(self._prefill_dispatch(bucket, reqs))

    def _prefill_dispatch(self, bucket: int, reqs):
        """Phase 1: enqueue the group prefill on the device and return
        staged handles — NO host sync, so a cold burst's admission groups
        run back-to-back on the device instead of paying one fetch RTT +
        emission pass between groups."""
        cfg, scfg = self.cfg, self.scfg
        self._ensure_bucket_compiled(bucket)
        k = len(reqs)
        # 2-3-request groups dispatch through the next precompiled
        # signature {4, 16} with value-preserving dummy rows (t_end=1,
        # temperature/top_p 1.0, top_k 1, outputs discarded) — same trick
        # _ensure_bucket_compiled uses. One padded 4-row prefill reads the
        # weights ONCE where two 1-row prefills would read them twice, and
        # BOTH the miss and prefix-hit branches stay on the {1, 4, 16}
        # row-count signatures.
        ksig, pad = _alloc_rows(k), _alloc_rows(k) - k
        t_ends = np.asarray([req.prompt.shape[1] for req in reqs], np.int32)
        pks = _seed_keys(jnp.asarray(
            [r.seed for r in reqs] + [0] * pad, jnp.uint32
        ))
        ones = [1.0] * pad
        temps = jnp.asarray(
            [r.temperature for r in reqs] + ones, jnp.float32)
        top_ps = jnp.asarray([r.top_p for r in reqs] + ones, jnp.float32)
        top_ks = jnp.asarray([r.top_k for r in reqs] + [1] * pad, jnp.int32)
        pre = self._group_prefix(reqs, bucket)
        if pre is not None:
            # The scratch must hold (a) the FULL stored rows (the restore
            # is a dynamic_update_slice: update <= operand) and (b) the
            # prefix + bucketed suffix, which can exceed the prompt bucket
            # (near-identical prompts: m = t-1 but the suffix pads to 64).
            # Preferring the stored bucket keeps the common same-speaker
            # case on the signature the miss path already precompiled;
            # only the suffix jit itself compiles lazily on a group's
            # FIRST hit per (k, sbucket, bucket) — noted in serving docs.
            m, rows, sbucket = pre
            entry_bucket = rows["k"].shape[2]
            bucket = (entry_bucket if m + sbucket <= entry_bucket
                      else pick_bucket(m + sbucket, self.cache_len))
        # fresh ksig-row cache (NOT shared scratch): the entry owns it
        cache = dual_ar.init_kv_cache(cfg, ksig, bucket, self.dtype,
                                      quant=self.kv_quant)
        if pre is not None:
            self.prefix.hits += 1
            inp_s = np.zeros((ksig, cfg.num_codebooks + 1, sbucket),
                             np.int32)
            ts = np.ones((ksig,), np.int32)  # pad rows: one zero token
            for j, req in enumerate(reqs):
                ts[j] = req.prompt.shape[1] - m
                inp_s[j, :, : ts[j]] = req.prompt[:, m:]
            column, next_keys, cache = prefill_group_parked_suffix(
                self.params, cfg, scfg, jnp.asarray(inp_s), cache, rows,
                jnp.int32(m), jnp.asarray(ts), bucket, pks,
                temps, top_ps, top_ks,
            )
        else:
            if self.prefix.size:
                self.prefix.misses += 1
            t_sig = np.concatenate([t_ends, np.ones((pad,), np.int32)])
            inp = np.zeros((ksig, cfg.num_codebooks + 1, bucket), np.int32)
            for j, req in enumerate(reqs):
                inp[j, :, : t_ends[j]] = req.prompt
            column, next_keys, cache = self._dispatch_park(
                jnp.asarray(inp), cache, jnp.asarray(t_sig), pks, temps,
                top_ps, top_ks,
            )
            if self.prefix.size and self.prefix.accepts(reqs[0].prompt):
                self.prefix.store(
                    reqs[0].prompt,
                    {name: arr[:, :1, :bucket] for name, arr in cache.items()},
                    bucket,
                )
        for h in (column, next_keys):
            try:
                h.copy_to_host_async()
            except AttributeError:
                break
        return reqs, t_ends, column, next_keys, cache, ksig

    def _prefill_finalize(self, staged) -> Optional[_Parked]:
        """Phase 2: fetch the staged group's first columns, stream each
        request's first frame, and build the parked entry (None if every
        row died at its prefill frame)."""
        cfg = self.cfg
        reqs, t_ends, column, next_keys, cache, ksig = staged
        k = len(reqs)
        cols = np.asarray(column)[:k]
        nkeys = np.asarray(next_keys)[:k]
        alive = []
        for j, req in enumerate(reqs):
            req.out.put(cols[j : j + 1])  # first frame, streamed immediately
            t = int(t_ends[j])
            if int(cols[j, 0]) == cfg.im_end_id or self._request_budget(
                req, t
            ) <= 1:
                req.out.put(None)
                alive.append(False)
            else:
                alive.append(True)
        if not any(alive):
            return None
        return _Parked(cache=cache, reqs=list(reqs), t_ends=t_ends,
                       cols=cols, nkeys=nkeys, alive=alive,
                       rows_alloc=ksig)

    def _group_prefix(self, reqs, bucket: int):
        """Shared-prefix lookup for an admission group.

        Returns (m, rows, sbucket) only when EVERY request shares the
        stored prefix for >= 64 columns (m = the group minimum) and the
        bucketed suffixes still fit the scratch bucket; else None (full
        group prefill). Single-speaker bursts are the hit case."""
        if not self.prefix.size:
            return None
        hit = self.prefix.lookup(reqs[0].prompt)
        if hit is None:
            return None
        m, rows = hit
        p0 = reqs[0].prompt
        for req in reqs[1:]:
            n = min(req.prompt.shape[1] - 1, p0.shape[1], m)
            eq = (req.prompt[:, :n] == p0[:, :n]).all(axis=0)
            m = int(np.argmin(eq)) if not eq.all() else n
            if m < 64:
                return None
        max_ts = max(r.prompt.shape[1] for r in reqs) - m
        sbucket = pick_bucket(max_ts, self.cache_len)
        if m + sbucket > self.cache_len or m + sbucket > self.cfg.max_seq_len:
            return None  # suffix pad tail would overrun the cache
        return m, rows, sbucket

    # -- AOT dispatch (see __init__._aot) --------------------------------

    def _dispatch_decode(self, n, kv_len, token, pool, pos, window, keys,
                         active, temperature, top_p, top_k):
        """One pool decode chunk: AOT executable on exact signature match,
        jit otherwise. A stale AOT entry (operand aval/pytree drift) warns
        once, is evicted, and the chunk completes via jit."""
        sig = ("decode", int(n), int(kv_len))
        fn = self._aot.get(sig)
        if fn is not None:
            try:
                return fn(self.params, token, pool, pos, window, keys,
                          active, temperature, top_p, top_k)
            except (TypeError, ValueError) as e:
                del self._aot[sig]
                warnings.warn(f"AOT pool decode evicted, fell back to jit: {e}")
        return decode_chunk_multi(
            self.params, self.cfg, self.scfg, n, token, pool, pos, window,
            keys, active, temperature, top_p, top_k, kv_len,
        )

    def _dispatch_park(self, inp, cache, t_sig, pks, temps, top_ps, top_ks):
        """One group prefill (miss path): AOT on exact (k, bucket) match,
        jit otherwise."""
        k, _, bucket = inp.shape
        sig = ("park", int(k), int(bucket))
        fn = self._aot.get(sig)
        if fn is not None:
            try:
                return fn(self.params, inp, cache, t_sig, pks, temps,
                          top_ps, top_ks)
            except (TypeError, ValueError) as e:
                del self._aot[sig]
                warnings.warn(f"AOT park prefill evicted, fell back to jit: {e}")
        return prefill_group_parked(self.params, self.cfg, self.scfg, inp,
                                    cache, t_sig, pks, temps, top_ps, top_ks)

    def _dispatch_scatter(self, pool, parked_cache, src_idx, rows, take):
        """One parked-rows scatter: AOT on exact (k, bucket) match (keyed
        by the parked cache's row count and bucket), jit otherwise."""
        kshape = parked_cache["k"].shape
        sig = ("scatter", int(kshape[1]), int(kshape[2]))
        fn = self._aot.get(sig)
        if fn is not None:
            try:
                return fn(pool, parked_cache, src_idx, rows, take)
            except (TypeError, ValueError) as e:
                del self._aot[sig]
                warnings.warn(f"AOT scatter evicted, fell back to jit: {e}")
        return scatter_parked_rows(pool, parked_cache, src_idx, rows, take)

    def precompile(self, buckets=None, execute: bool = True) -> dict:
        """AOT-compile every admission/decode jit signature the pool can
        dispatch, in PARALLEL threads (same mechanism as
        `GenerationSession.precompile`): the programs are independent, and
        compiling them serially inside the first burst was the bulk of a
        ~100 s cache-cold warmup. Operands are ShapeDtypeStructs for the
        big buffers (no second cache allocation); the later no-op warmup
        calls in `_ensure_bucket_compiled` then hit the persistent
        compilation cache. Returns {signature: seconds}.

        execute=True additionally runs each pool-decode program once with
        an all-False `active` mask (value-preserving: inactive rows are
        frozen) and runs `_ensure_bucket_compiled` for every bucket, then
        waits via a HOST FETCH. Compiling alone is not enough on a remote
        device: the server materializes a program at its first execution
        (measured 35-370 s for a big prefill when that landed on the
        first real request), and `block_until_ready` through the tunnel
        was observed returning before that work finished — only a
        device-to-host fetch reliably absorbs it here, at startup.
        MUST run before serving traffic (donates the pool between
        dispatches), which is when the server and bench call it.

        buckets: prompt buckets to cover; default = every PROMPT_BUCKET a
        request can legally produce (prompts are bounded by max_seq_len),
        so a production server never pays a serial mid-serving prefill
        compile for an unusual prompt length. Callers with a known prompt
        set (the bench) pass exactly theirs."""
        import concurrent.futures

        if execute and (any(s.active for s in self.slots) or self.parked
                        or self._overflow or not self.pending.empty()):
            # execute=True donates (garbage-fills) the live pool between
            # dispatches — running it while the worker is serving would
            # corrupt every in-flight request's KV rows. Fail loudly.
            raise RuntimeError(
                "ContinuousBatcher.precompile(execute=True) must run before "
                "serving traffic: the warm-up chain donates the live pool"
            )

        cfg, scfg = self.cfg, self.scfg
        if buckets is None:
            buckets = tuple(b for b in PROMPT_BUCKETS
                            if b < cfg.max_seq_len) or (cfg.max_seq_len,)
        p = self.pool_size
        pool_abs = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.pool
        )
        token = jnp.zeros((p, cfg.num_codebooks + 1), jnp.int32)
        pos = jnp.zeros((p,), jnp.int32)
        window = jnp.zeros((p, scfg.ras_win_size), jnp.int32)
        keys = jnp.zeros((p, 2), jnp.uint32)
        active = jnp.zeros((p,), bool)
        vec_f = jnp.zeros((p,), jnp.float32)
        vec_i = jnp.full((p,), 30, jnp.int32)

        jobs = {}
        for n in self._decode_lengths():
            for kv_len in self.kv_buckets:
                jobs[f"decode_{n}@{kv_len}"] = (
                    lambda n=n, kv=kv_len: decode_chunk_multi.lower(
                        self.params, cfg, scfg, n, token, pool_abs, pos,
                        window, keys, active, vec_f, vec_f, vec_i, kv,
                    ).compile()
                )

        ks = sorted({g for g in (16, 4, 1) if g <= max(p, 1)} | {1})
        for bucket in buckets:
            for k in ks:
                cache_abs = jax.eval_shape(
                    lambda k=k, b=bucket: dual_ar.init_kv_cache(
                        cfg, k, b, self.dtype, quant=self.kv_quant
                    )
                )
                zi = jnp.zeros((k, cfg.num_codebooks + 1, bucket), jnp.int32)
                ends = jnp.ones((k,), jnp.int32)
                pks = _seed_keys(jnp.zeros((k,), jnp.uint32))
                ones = jnp.ones((k,), jnp.float32)
                ones_i = jnp.ones((k,), jnp.int32)
                jobs[f"park_{k}@{bucket}"] = (
                    lambda zi=zi, ca=cache_abs, ends=ends, pks=pks,
                    ones=ones, ones_i=ones_i: prefill_group_parked.lower(
                        self.params, cfg, scfg, zi, ca, ends, pks, ones,
                        ones, ones_i,
                    ).compile()
                )
                jobs[f"scatter_{k}@{bucket}"] = (
                    lambda ca=cache_abs: scatter_parked_rows.lower(
                        pool_abs, ca, jnp.zeros((p,), jnp.int32),
                        jnp.arange(p, dtype=jnp.int32),
                        jnp.zeros((p,), bool),
                    ).compile()
                )

        times = {}
        compiled = {}

        def run(name, fn):
            t0 = _time.perf_counter()
            compiled[name] = fn()
            times[name] = round(_time.perf_counter() - t0, 1)

        with concurrent.futures.ThreadPoolExecutor(
            min(len(jobs), 16)
        ) as ex:
            futs = [ex.submit(run, name, fn) for name, fn in jobs.items()]
            for f in futs:
                f.result()

        # register for AOT dispatch (see __init__._aot): the worker loop
        # dispatches through these same executables, so the programs warmed
        # below are the programs serving actually runs
        for n in self._decode_lengths():
            for kv_len in self.kv_buckets:
                self._aot[("decode", n, kv_len)] = (
                    compiled[f"decode_{n}@{kv_len}"]
                )
        for bucket in buckets:
            for k in ks:
                self._aot[("park", _alloc_rows(k), bucket)] = (
                    compiled[f"park_{k}@{bucket}"]
                )
                self._aot[("scatter", _alloc_rows(k), bucket)] = (
                    compiled[f"scatter_{k}@{bucket}"]
                )

        if execute:
            # warm-execute (see docstring): pool-decode programs with the
            # all-False active mask (frozen rows — value-preserving), pool
            # donated through the chain; then the admission programs via
            # their existing value-preserving no-op calls.
            t0 = _time.perf_counter()
            fresh = []
            for n in self._decode_lengths():
                for kv_len in self.kv_buckets:
                    res = compiled[f"decode_{n}@{kv_len}"](
                        self.params, token, self.pool, pos, window, keys,
                        active, vec_f, vec_f, vec_i,
                    )
                    self.pool = res[2]
                    fresh.append(res[0])
            jax.device_get(fresh)
            for bucket in buckets:
                self._ensure_bucket_compiled(bucket)
            times["execute"] = round(_time.perf_counter() - t0, 1)
        return times

    def _ensure_bucket_compiled(self, bucket: int):
        """Deterministically compile every admission signature this bucket
        can produce, BEFORE the first real admission uses it. Admission
        group sizes depend on arrival-race timing; without this, a burst
        could hit an uncompiled (k, bucket) signature mid-measurement and
        stall every client behind a multi-second remote compile (observed:
        first-chunk p50 jumping 1.2 s -> 27 s run-to-run). All dummy calls
        are value-preserving: the parked prefill writes only its own fresh
        scratch, and the scatter runs with an all-False take mask."""
        if bucket in self._compiled_buckets:
            return
        self._compiled_buckets.add(bucket)
        cfg, scfg = self.cfg, self.scfg
        p = self.pool_size
        ks = sorted({g for g in (16, 4, 1) if g <= max(p, 1)} | {1})
        for k in ks:
            zi = jnp.zeros((k, cfg.num_codebooks + 1, bucket), jnp.int32)
            zcache = dual_ar.init_kv_cache(cfg, k, bucket, self.dtype,
                                           quant=self.kv_quant)
            ends = jnp.ones((k,), jnp.int32)
            pks = _seed_keys(jnp.zeros((k,), jnp.uint32))
            ones = jnp.ones((k,), jnp.float32)
            # dispatched through the SAME path serving uses (AOT when
            # registered, jit otherwise), so the executable warmed here is
            # the one the first real admission runs
            _, _, zcache = self._dispatch_park(
                zi, zcache, ends, pks, ones, ones, jnp.ones((k,), jnp.int32),
            )
            self.pool = self._dispatch_scatter(
                self.pool, zcache, jnp.zeros((p,), jnp.int32),
                jnp.arange(p, dtype=jnp.int32), jnp.zeros((p,), bool),
            )
        # host FETCH, not block_until_ready: the scatter output aliases the
        # donated pool, and through the remote tunnel block_until_ready on
        # it was observed returning before the server finished the warmup
        # chain (which would defer the program-materialization stall to
        # the first real admission). A tiny D2H fetch cannot return early.
        leaf = jax.tree_util.tree_leaves(self.pool)[0]
        jax.device_get(leaf[(0,) * leaf.ndim])
        _dbg(f"bucket {bucket} admission signatures compiled")

    def _activate_parked(self, pk: _Parked, idxs, rows):
        """Move parked rows `idxs` into pool slots `rows` (no re-prefill)
        via the fixed-shape masked scatter (one compile per bucket/k)."""
        cfg = self.cfg
        p = self.pool_size
        src_idx = np.zeros((p,), np.int32)
        take = np.zeros((p,), bool)
        # rows is a permutation of pool rows: targeted rows first, the
        # remaining rows mapped to themselves with take=False
        row_perm = list(rows) + [r for r in range(p) if r not in rows]
        for j, r in zip(idxs, rows):
            pos_in_perm = row_perm.index(r)
            src_idx[pos_in_perm] = j
            take[pos_in_perm] = True
        self.pool = self._dispatch_scatter(
            self.pool, pk.cache, jnp.asarray(src_idx),
            jnp.asarray(row_perm, jnp.int32), jnp.asarray(take),
        )
        mask = np.zeros((p,), bool)
        n_token = np.zeros((p, cfg.num_codebooks + 1), np.int32)
        n_pos = np.zeros((p,), np.int32)
        n_keys = np.zeros((p, 2), np.uint32)
        n_temp = np.zeros((p,), np.float32)
        n_top_p = np.zeros((p,), np.float32)
        n_top_k = np.zeros((p,), np.int32)
        for j, r in zip(idxs, rows):
            req = pk.reqs[j]
            t = int(pk.t_ends[j])
            s = self.slots[r]
            s.active = True
            s.request = req
            s.pos = t
            s.budget_left = self._request_budget(req, t) - 1
            mask[r] = True
            n_token[r] = pk.cols[j]
            n_pos[r] = t
            n_keys[r] = pk.nkeys[j]
            n_temp[r] = req.temperature
            n_top_p[r] = req.top_p
            n_top_k[r] = req.top_k
            pk.alive[j] = False
        (self.token, self.pos, self.window, self.keys, self.active,
         self.temperature, self.top_p, self.top_k) = _apply_admission(
            self.token, self.pos, self.window, self.keys, self.active,
            self.temperature, self.top_p, self.top_k,
            jnp.asarray(mask), jnp.asarray(n_token), jnp.asarray(n_pos),
            jnp.asarray(n_keys), jnp.asarray(n_temp), jnp.asarray(n_top_p),
            jnp.asarray(n_top_k),
        )

    def _loop(self):
        """Worker entry: a crash (device OOM, compile failure) must FAIL
        every waiting client instead of dying silently — a dead worker
        with clients blocked on their queues hangs the whole server."""
        try:
            self._loop_inner()
        except BaseException as e:  # noqa: BLE001
            _dbg(f"worker crashed: {type(e).__name__}: {e}")
            self._worker_error = e
            # terminate every waiting stream with the EXCEPTION, not the
            # normal-completion None: callers must be able to distinguish
            # "crashed at frame 40" from "im_end at frame 40"
            for s in self.slots:
                if s.active and s.request is not None:
                    s.request.out.put(e)
                    s.active = False
            for pk in self.parked:
                for j, req in enumerate(pk.reqs):
                    if pk.alive[j]:
                        req.out.put(e)
            self.parked.clear()
            self._drain_pending()
            for req in self._overflow:
                req.out.put(e)
            self._overflow.clear()
            raise

    def _loop_inner(self):
        cfg = self.cfg
        while not self._stop.is_set():
            admitted = self._admit()
            if not any(s.active for s in self.slots):
                self._wake.wait(timeout=0.1)
                self._wake.clear()
                continue

            # streaming latency: right after an admission — or while
            # overflow requests are STILL WAITING for their admission
            # prefill AND parked-row budget remains (a park will actually
            # happen next pass) — run a SHORT chunk so first frames / the
            # next park come quickly. Under SUSTAINED overload (budget
            # exhausted, overflow can only drain when slots free) chunks
            # stay full-length: shortening them there would be 8x the
            # host syncs for the whole backlog with nothing to park.
            waiting_park = self._overflow and (
                sum(pk.rows_alloc for pk in self.parked) < self.park_max_rows
            )
            n = self.first_chunk if (admitted or waiting_park) else self.chunk
            self._run_chunk(n)

    def _admit_possible(self) -> bool:
        """Whether an `_admit` pass could place a pending request right
        now (free pool slot, or parked-row budget for an overflow
        prefill) — the gate for abandoning a chunk's remaining
        sub-chunks early."""
        if any(not s.active for s in self.slots):
            return True
        return (
            sum(pk.rows_alloc for pk in self.parked) < self.park_max_rows
        )

    def _chunk_plan(self, n: int):
        """Split an n-step chunk into pipelined sub-chunk dispatch lengths
        (each distinct length is one compile signature per kv bucket)."""
        sub = self.admit_every
        if not sub or n <= sub:
            return [n]
        plan = [sub] * (n // sub)
        if n % sub:
            plan.append(n % sub)
        return plan

    def _decode_lengths(self):
        """Every decode-step count the worker can dispatch (precompile
        covers exactly these)."""
        return sorted(set(self._chunk_plan(self.chunk))
                      | set(self._chunk_plan(self.first_chunk)))

    def _run_chunk(self, n: int):
        """Dispatch an n-step decode as PIPELINED sub-chunks with early
        admission (open-loop latency, round 5).

        One monolithic n-step dispatch made the worker deaf for its whole
        duration: a request arriving just after dispatch waited the full
        chunk (a 128-step chunk on the 32-slot flagship pool is ~2.8 s of
        device time — the measured open-loop TTFA p50 at 2 req/s was
        1.63 s, almost all of it this wait). Simply shrinking the chunk
        pays one host fetch round-trip PER chunk while the device idles
        (measured on the 32-stream default: 1536 f/s at 128-step chunks,
        1494 at 32, 1348 at 16 — ~46 ms/chunk of gap through the remote
        tunnel).

        This loop keeps both properties: sub-chunks of `admit_every`
        steps are dispatched with up to TWO in flight, so the device runs
        back-to-back (sub-chunk i+1 executes while the host fetches i's
        columns across the tunnel — the fetch RTT hides under device
        time), frames stream to clients per sub-chunk, and the pending
        queue is checked BEFORE each dispatch and between fetches. On
        arrival the remaining sub-chunks are not dispatched and `_admit`
        runs IMMEDIATELY, WHILE the already-dispatched sub-chunks are
        still in flight: its admission prefill enqueues right behind them
        on the device, so the new request's first frame starts computing
        ~one sub-chunk after arrival and the pipeline never drains idle
        (the pre-overlap design drained first and paid one exposed fetch
        RTT per admission — measured as 759 → 619 f/s at saturation when
        the sub-chunk length was dropped 8 → 4 for latency). The
        interrupt only fires when admission could actually make progress
        (a free slot or parked-row budget, `_admit_possible`) — under
        sustained overload the backlog can only drain when slots free,
        and abandoning chunks there buys nothing.

        Because `_admit` can hand a slot to a NEW request while an older
        sub-chunk is still in flight, each in-flight entry carries a
        SNAPSHOT of (request-per-slot, active, pos) from its dispatch:
        emission bookkeeping only touches slots still owned by the
        request that was decoding when that sub-chunk launched — a slot
        whose request finished in sub-chunk i and was re-filled by the
        overlapped admission must not receive sub-chunk i+1's frozen
        columns (the device masked the old row at its im_end; the new
        row only decodes from the chunk dispatched after its insert)."""
        from collections import deque

        cfg = self.cfg
        plan = self._chunk_plan(n)
        max_pos_est = max((s.pos for s in self.slots if s.active), default=0)
        inflight = deque()
        next_i = 0
        stop_dispatch = False

        def interrupt() -> bool:
            if self._stop.is_set():
                return True
            if self.pending.empty() or not self._admit_possible():
                return False
            # overlapped admission: the prefill + insert dispatches queue
            # behind the in-flight sub-chunks; their entries drain below
            # with snapshot gating
            self._admit()
            return True

        while next_i < len(plan) or inflight:
            while (not stop_dispatch and next_i < len(plan)
                   and len(inflight) < 2):
                if inflight and interrupt():
                    # don't enqueue more device work ahead of a new
                    # request's admission (the first dispatch always
                    # proceeds — the pool must advance even with a
                    # backlog the admission pass cannot place yet)
                    stop_dispatch = True
                    next_i = len(plan)
                    break
                ni = plan[next_i]
                kv_len = next(
                    (b for b in self.kv_buckets
                     if max_pos_est + ni + 1 <= b),
                    self.cache_len,
                )
                owners = tuple(
                    s.request if s.active else None for s in self.slots
                )
                (cols, self.token, self.pool, self.pos, self.window,
                 self.keys, self.active) = self._dispatch_decode(
                    ni, kv_len, self.token, self.pool, self.pos, self.window,
                    self.keys, self.active, self.temperature, self.top_p,
                    self.top_k,
                )
                # stream results host-ward as the device produces them:
                # the drain's np.asarray then finds bytes already local
                # instead of paying a tunnel round-trip per entry (the
                # drain sits on the admission critical path)
                for h in (cols, self.active, self.pos):
                    try:
                        h.copy_to_host_async()
                    except AttributeError:
                        break
                inflight.append((ni, cols, self.active, self.pos, owners))
                max_pos_est += ni
                next_i += 1

            ni, cols, active_h, pos_h, owners = inflight.popleft()
            cols_np = np.asarray(cols)  # (ni, B, C+1)
            _dbg(f"chunk n={ni} active={int(np.asarray(active_h).sum())}")
            still_active = np.asarray(active_h)
            pos_np = np.asarray(pos_h)
            for i, s in enumerate(self.slots):
                if owners[i] is None or s.request is not owners[i]:
                    continue  # freed, or re-owned by overlapped admission
                s.pos = int(pos_np[i])
                slot_cols = cols_np[:, i]  # (ni, C+1)
                ends = np.nonzero(slot_cols[:, 0] == cfg.im_end_id)[0]
                n_emit = min(
                    int(ends[0]) + 1 if len(ends) else ni,
                    s.budget_left,
                )
                if n_emit > 0:
                    s.request.out.put(slot_cols[:n_emit])
                s.budget_left -= ni
                finished = len(ends) > 0 or s.budget_left <= 0 or not bool(
                    still_active[i]
                )
                if finished:
                    s.request.out.put(None)
                    s.active = False
                    s.request = None
                    self.active = self.active.at[i].set(False)

            if not stop_dispatch and interrupt():
                stop_dispatch = True
                next_i = len(plan)  # abandon the rest; drain in-flight
