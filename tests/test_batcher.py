"""Continuous batcher: concurrent requests through the shared decode pool."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # jit-compile heavy; fast tier skips with -m 'not heavy'

from fish_speech_tpu.config import SamplingConfig, dual_ar_tiny
from fish_speech_tpu.engine.batcher import BatchRequest, ContinuousBatcher
from fish_speech_tpu.models import dual_ar

from tests.test_dual_ar import random_prompt


@pytest.fixture(scope="module")
def batcher():
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3, max_seq_len=128
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(), pool_size=3, dtype=jnp.float32,
        decode_chunk_size=4,
    )
    yield b
    b.shutdown()


def _check(cfg, out):
    assert out.shape[0] == cfg.num_codebooks + 1
    sb, se = cfg.semantic_begin_id, cfg.semantic_end_id
    main = out[0]
    ok = ((main >= sb) & (main <= se)) | (main == cfg.im_end_id)
    assert ok.all()
    # im_end can only be the last column
    assert not (main[:-1] == cfg.im_end_id).any()


def test_single_request(batcher):
    cfg = batcher.cfg
    prompt = random_prompt(cfg, 10)
    out = batcher.generate(prompt, max_new_tokens=9, seed=1)
    assert 1 <= out.shape[1] <= 9
    _check(cfg, out)


def test_concurrent_requests(batcher):
    cfg = batcher.cfg
    rng = np.random.default_rng(0)
    results = {}

    def worker(i, t):
        prompt = random_prompt(cfg, t, np.random.default_rng(i))
        results[i] = batcher.generate(prompt, max_new_tokens=8 + i, seed=i)

    threads = [
        threading.Thread(target=worker, args=(i, 6 + 3 * i)) for i in range(5)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    assert len(results) == 5
    for i, out in results.items():
        assert 1 <= out.shape[1] <= 8 + i
        _check(cfg, out)


def test_deterministic_per_seed(batcher):
    """A request's output depends only on its own seed/prompt, not pool
    traffic."""
    cfg = batcher.cfg
    prompt = random_prompt(cfg, 8)
    a = batcher.generate(prompt, max_new_tokens=7, seed=123)
    b = batcher.generate(prompt, max_new_tokens=7, seed=123)
    np.testing.assert_array_equal(a, b)


def test_more_requests_than_slots(batcher):
    cfg = batcher.cfg
    outs = []
    qs = []
    for i in range(7):  # pool_size is 3
        prompt = random_prompt(cfg, 6, np.random.default_rng(100 + i))
        qs.append(batcher.submit(BatchRequest(prompt=prompt, max_new_tokens=6,
                                              seed=i)))
    for q in qs:
        chunks = []
        while True:
            item = q.get(timeout=120)
            if item is None:
                break
            chunks.append(item)
        outs.append(np.concatenate(chunks, axis=0).T)
    assert len(outs) == 7
    for out in outs:
        _check(cfg, out)


def test_grouped_admission_matches_solo(batcher):
    """A request's output must not depend on how its admission was grouped
    (the per-row sampling key derives only from the request seed)."""
    import threading

    cfg = batcher.cfg
    rng = np.random.default_rng(9)
    prompts = []
    for t in (6, 9, 12, 7, 11):
        p = np.zeros((cfg.num_codebooks + 1, t), dtype=np.int32)
        p[0] = rng.integers(4, 200, size=t)
        prompts.append(p)

    # solo: submit sequentially (each admitted alone)
    solo = [
        batcher.generate(p, max_new_tokens=6, seed=50 + i)
        for i, p in enumerate(prompts)
    ]

    # burst: submit all at once (admitted as a group)
    results = [None] * len(prompts)

    def go(i):
        results[i] = batcher.generate(prompts[i], max_new_tokens=6, seed=50 + i)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(len(prompts))]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    for i, (a, b) in enumerate(zip(solo, results)):
        np.testing.assert_array_equal(a, b, err_msg=f"request {i}")


def test_mixed_length_padded_group_admission():
    """Mixed-length bursts produce 2-3-request per-bucket groups, which
    dispatch through the PADDED 4-row signature (`_prefill_parked`) and
    must produce exactly the outputs of solo admission; `_group_plan`
    carries the grouping rule."""
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3,
        max_seq_len=192,
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(), pool_size=6, dtype=jnp.float32,
        decode_chunk_size=4,
    )
    try:
        assert b._group_plan(1) == [1]
        assert b._group_plan(2) == [2]
        assert b._group_plan(3) == [3]
        assert b._group_plan(4) == [4]
        assert b._group_plan(5) == [4, 1]
        assert b._group_plan(7) == [4, 3]

        rng = np.random.default_rng(17)
        prompts = []
        for t in (6, 9, 70, 11, 75, 66):  # buckets 64 and 128 interleaved
            p = np.zeros((cfg.num_codebooks + 1, t), dtype=np.int32)
            p[0] = rng.integers(4, 200, size=t)
            prompts.append(p)

        solo = [
            b.generate(p, max_new_tokens=5, seed=90 + i)
            for i, p in enumerate(prompts)
        ]

        results = [None] * len(prompts)

        def go(i):
            results[i] = b.generate(prompts[i], max_new_tokens=5, seed=90 + i)

        threads = [threading.Thread(target=go, args=(i,))
                   for i in range(len(prompts))]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for i, (a, r) in enumerate(zip(solo, results)):
            np.testing.assert_array_equal(a, r, err_msg=f"request {i}")
    finally:
        b.shutdown()


def test_burst_overflow_parked_first_frame(batcher):
    """With the pool full, overflow requests are PREFILLED INTO PARKED
    caches: their first frame streams back while the pool is still busy,
    and their full outputs (later resumed from the parked cache without
    re-prefilling) are identical to solo runs with the same seed."""
    import time

    cfg = batcher.cfg

    # solo references for the overflow wave (pool idle)
    prompts2 = [
        random_prompt(cfg, 6, np.random.default_rng(300 + i)) for i in range(4)
    ]
    solo = [
        batcher.generate(p, max_new_tokens=6, seed=300 + i)
        for i, p in enumerate(prompts2)
    ]

    # occupy all 3 slots with long-running requests
    wave1 = [
        BatchRequest(
            prompt=random_prompt(cfg, 6, np.random.default_rng(200 + i)),
            max_new_tokens=60, seed=200 + i,
        )
        for i in range(3)
    ]
    qs1 = [batcher.submit(r) for r in wave1]
    for q in qs1:  # wait until every slot has produced something
        q.get(timeout=120)

    # overflow wave: no free slots -> parked prefill
    wave2 = [
        BatchRequest(prompt=p, max_new_tokens=6, seed=300 + i)
        for i, p in enumerate(prompts2)
    ]
    t0 = time.time()
    qs2 = [batcher.submit(r) for r in wave2]
    firsts = [q.get(timeout=120) for q in qs2]
    first_latency = time.time() - t0
    for f in firsts:
        assert f is not None and f.shape[0] == 1  # first frame column

    # drain everything and compare overflow outputs to solo
    def drain(q, head):
        chunks = [] if head is None else [head]
        while True:
            item = q.get(timeout=120)
            if item is None:
                break
            chunks.append(item)
        return np.concatenate(chunks, axis=0).T

    outs2 = [drain(q, f) for q, f in zip(qs2, firsts)]
    for q in qs1:
        while q.get(timeout=120) is not None:
            pass
    for i, (a, b) in enumerate(zip(solo, outs2)):
        np.testing.assert_array_equal(a, b, err_msg=f"overflow request {i}")
    # the first frames arrived from parked prefills, not after wave-1
    # retirement (wave-1 budgets are ~10 chunks; this is a sanity bound,
    # generous for CI boxes)
    assert first_latency < 60


def test_first_chunk_ramp():
    """With first_chunk_size set, a fresh request's first streamed chunk is
    small; totals and determinism are unchanged."""
    from fish_speech_tpu.config import SamplingConfig, dual_ar_tiny
    from fish_speech_tpu.engine.batcher import BatchRequest, ContinuousBatcher
    from fish_speech_tpu.models import dual_ar
    import jax, jax.numpy as jnp

    cfg = dual_ar_tiny(semantic_begin_id=300, semantic_end_id=331, im_end_id=3)
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    bt = ContinuousBatcher(params, cfg, SamplingConfig(), pool_size=2,
                           dtype=jnp.float32, decode_chunk_size=12,
                           first_chunk_size=3)
    try:
        rng = np.random.default_rng(4)
        p = np.zeros((cfg.num_codebooks + 1, 7), dtype=np.int32)
        p[0] = rng.integers(4, 200, size=7)
        req = BatchRequest(prompt=p, max_new_tokens=20, seed=5)
        out_q = bt.submit(req)
        chunks = []
        while True:
            item = out_q.get(timeout=60)
            if item is None:
                break
            chunks.append(item)
        # first chunk after the prefill frame is the ramped small one
        assert chunks[0].shape[0] == 1  # prefill frame
        if len(chunks) > 1:
            assert chunks[1].shape[0] <= 3
        total = sum(c.shape[0] for c in chunks)
        assert 1 <= total <= 20
        # determinism across the ramp
        again = bt.generate(p, max_new_tokens=20, seed=5)
        np.testing.assert_array_equal(
            np.concatenate(chunks, axis=0).T, again
        )
    finally:
        bt.shutdown()


def test_kv_quant_pool():
    """The int8-KV pool serves concurrent requests (parked admission,
    scatter with scales) and produces valid constrained tokens."""
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3, max_seq_len=128
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(), pool_size=2, dtype=jnp.float32,
        decode_chunk_size=4, kv_quant=True,
    )
    try:
        assert b.pool["k"].dtype == jnp.int8 and "ks" in b.pool
        results = {}

        def worker(i):
            prompt = random_prompt(cfg, 8 + i, np.random.default_rng(i))
            results[i] = b.generate(prompt, max_new_tokens=6, seed=i)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4
        for out in results.values():
            _check(cfg, out)
        # determinism per seed holds under kv_quant too
        p = random_prompt(cfg, 9, np.random.default_rng(99))
        a = b.generate(p, max_new_tokens=6, seed=5)
        c = b.generate(p, max_new_tokens=6, seed=5)
        np.testing.assert_array_equal(a, c)
    finally:
        b.shutdown()


@pytest.mark.parametrize("pool_size", [2, 6])
def test_group_admission_prefix_cache_matches_cold(pool_size):
    """Same-speaker burst: the second wave's group admission restores the
    stored prefix and suffix-prefills — outputs must be IDENTICAL to a
    prefix-cache-off batcher for the same seeds (f32 path). pool_size=2
    admits hits row by row; pool_size=6 forms a 3-request group, which
    rides the PADDED 4-row hit signature (pad rows value-preserving)."""
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3, max_seq_len=512
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    shared = random_prompt(cfg, 150, np.random.default_rng(7))

    def prompts(n):
        out = []
        for i in range(n):
            tail = random_prompt(cfg, 8 + i, np.random.default_rng(100 + i))
            out.append(np.concatenate([shared, tail], axis=1))
        return out

    results = {}
    for name, pcs in (("cold", 0), ("warm", 3)):
        b = ContinuousBatcher(
            params, cfg, SamplingConfig(), pool_size=pool_size,
            dtype=jnp.float32, decode_chunk_size=4, prefix_cache_size=pcs,
        )
        try:
            outs = {}
            # wave 1: stores (or not); wave 2: group hit
            for wave in (0, 1):
                threads, ps = [], prompts(3)

                def worker(i, p):
                    outs[(wave, i)] = b.generate(
                        p, max_new_tokens=6, seed=10 * wave + i
                    )

                for i, p in enumerate(ps):
                    t = threading.Thread(target=worker, args=(i, p))
                    t.start()
                    threads.append(t)
                for t in threads:
                    t.join()
            results[name] = outs
            if pcs:
                assert b.prefix.hits >= 1, "second wave must hit the prefix"
        finally:
            b.shutdown()
    for key in results["cold"]:
        np.testing.assert_array_equal(
            results["warm"][key], results["cold"][key],
            err_msg=f"request {key} diverged under prefix caching",
        )


def test_worker_crash_fails_clients_instead_of_hanging():
    """A worker crash (device OOM, compile failure) must terminate every
    waiting client's stream, not leave them blocked forever."""
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3, max_seq_len=128
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(), pool_size=2, dtype=jnp.float32,
        decode_chunk_size=4,
    )
    try:
        boom = RuntimeError("simulated device OOM")

        def crash():
            raise boom

        b._admit = crash
        out = b.submit(BatchRequest(prompt=random_prompt(cfg, 10),
                                    max_new_tokens=4, seed=0))
        item = out.get(timeout=10)  # must unblock, not hang
        # the stream terminates with the EXCEPTION (distinguishable from a
        # normal im_end), whether routed by the crash handler or by
        # submit()'s dead-worker fail-fast
        assert isinstance(item, BaseException)
        b.thread.join(timeout=5)
        assert b._worker_error is boom
        # post-crash submissions fail fast instead of blocking forever
        out2 = b.submit(BatchRequest(prompt=random_prompt(cfg, 10),
                                     max_new_tokens=4, seed=1))
        assert isinstance(out2.get(timeout=5), BaseException)
        with pytest.raises(RuntimeError):
            b.generate(random_prompt(cfg, 10), max_new_tokens=4, seed=2)
    finally:
        b.shutdown()


def test_prefix_hit_smaller_than_stored_bucket():
    """A hit whose prefix+suffix bucket is SMALLER than the stored entry's
    bucket must still restore correctly (the scratch is sized to the
    stored rows; regression: dynamic_update_slice with update > operand
    crashed the worker)."""
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3, max_seq_len=512
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(), pool_size=2, dtype=jnp.float32,
        decode_chunk_size=4, prefix_cache_size=2,
    )
    try:
        shared = random_prompt(cfg, 70, np.random.default_rng(1))
        # store a LONG prompt (bucket 256)
        long_tail = random_prompt(cfg, 80, np.random.default_rng(2))
        b.generate(np.concatenate([shared, long_tail], axis=1),
                   max_new_tokens=4, seed=0)
        assert len(b.prefix) == 1
        # short request shares only the first 70 columns: m=70, suffix
        # bucket 64 -> prefix+suffix bucket 128 < stored bucket 256
        short = np.concatenate(
            [shared, random_prompt(cfg, 5, np.random.default_rng(3))], axis=1
        )
        out = b.generate(short, max_new_tokens=4, seed=1)
        assert b.prefix.hits == 1 and b._worker_error is None
        _check(cfg, out)
        # and must equal the cold result
        b2 = ContinuousBatcher(
            params, cfg, SamplingConfig(), pool_size=2, dtype=jnp.float32,
            decode_chunk_size=4, prefix_cache_size=0,
        )
        try:
            ref = b2.generate(short, max_new_tokens=4, seed=1)
        finally:
            b2.shutdown()
        np.testing.assert_array_equal(out, ref)
    finally:
        b.shutdown()


def test_park_group_respects_allocated_row_budget():
    """Parked device memory is bounded by ALLOCATED cache rows, not request
    count: a padded 2-request group owns a 4-row cache, so with only 2
    budget rows left the park-group selection must shrink to singles instead of
    overshooting park_max_rows (round-3 review finding)."""
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3, max_seq_len=128
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(), pool_size=6, dtype=jnp.float32,
        decode_chunk_size=4,
    )
    try:
        b.shutdown()  # drive the admission internals single-threaded

        def reqs(n, seed0):
            return [
                BatchRequest(prompt=random_prompt(cfg, 10), max_new_tokens=4,
                             seed=seed0 + i)
                for i in range(n)
            ]

        def park_one(max_rows):
            bucket, group = b._select_park_group(max_rows)
            pk = b._prefill_parked(bucket, group)
            if pk is not None:
                b.parked.append(pk)

        # budget 2: the pair would pad to a 4-row cache -> shrink to one
        b._overflow = reqs(2, 0)
        park_one(max_rows=2)
        assert len(b.parked) == 1
        assert b.parked[0].rows_alloc == 1 and len(b.parked[0].reqs) == 1
        assert len(b._overflow) == 1  # the second request waits its turn

        # full budget: the pair rides the padded 4-row signature as one group
        b._overflow = reqs(2, 10)
        park_one(max_rows=6)
        assert b.parked[-1].rows_alloc == 4 and len(b.parked[-1].reqs) == 2
        # _admit's budget check sums ALLOCATED rows (1 + 4, not 1 + 2)
        assert sum(pk.rows_alloc for pk in b.parked) == 5
    finally:
        b.shutdown()


def test_prefix_hit_group_pads_to_compiled_signature():
    """A 2-request group that HITS the prefix cache must allocate its cache
    at a precompiled row signature {1, 4, 16} — the unpadded k=2 hit path
    used to create fresh jit signatures mid-burst (round-3 review
    finding)."""
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3, max_seq_len=512
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(), pool_size=6, dtype=jnp.float32,
        decode_chunk_size=4, prefix_cache_size=2,
    )
    try:
        b.shutdown()  # drive _prefill_parked directly (no worker races)
        shared = random_prompt(cfg, 150, np.random.default_rng(7))

        def req(i):
            tail = random_prompt(cfg, 8 + i, np.random.default_rng(40 + i))
            return BatchRequest(
                prompt=np.concatenate([shared, tail], axis=1),
                max_new_tokens=4, seed=i,
            )

        from fish_speech_tpu.engine.batcher import pick_bucket

        r0 = req(0)
        bucket = pick_bucket(r0.prompt.shape[1], b.cache_len)
        pk = b._prefill_parked(bucket, [r0])  # miss: stores the prefix
        assert len(b.prefix) == 1 and pk is not None and pk.rows_alloc == 1

        pair = [req(1), req(2)]
        pk2 = b._prefill_parked(bucket, pair)  # 2-request HIT
        assert b.prefix.hits == 1
        assert pk2 is not None and len(pk2.reqs) == 2
        assert pk2.rows_alloc == 4  # padded to the compiled signature
        assert pk2.cache["k"].shape[1] == 4
    finally:
        b.shutdown()


def test_cancelled_requests_free_slots_and_stop_decoding():
    """Client-gone cancellation (VERDICT r2 serving hardening): an active
    slot is reaped at the next chunk boundary, a cancelled queued request
    never runs, and a mid-stream abandoned BatcherSession consumer frees
    its slot. im_end is masked so generation can ONLY stop via cancel —
    any early termination proves the cancel path, not sampling luck."""
    import time

    from fish_speech_tpu.engine.batcher import BatcherSession

    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3, max_seq_len=256
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(mask_im_end=True), pool_size=2,
        dtype=jnp.float32, decode_chunk_size=4,
    )
    try:
        prompt = random_prompt(cfg, 8)

        # 1. active slot: cancel after the first chunk arrives
        req = BatchRequest(prompt=prompt, max_new_tokens=200, seed=7)
        out = b.submit(req)
        first = out.get(timeout=120)
        assert isinstance(first, np.ndarray)
        req.cancelled.set()
        b._wake.set()
        n = first.shape[0]
        while True:
            item = out.get(timeout=120)
            if item is None:
                break
            assert isinstance(item, np.ndarray)
            n += item.shape[0]
        assert n < 200, "reaped request decoded its whole budget anyway"

        # 2. queued request cancelled before admission: terminated, never run
        req2 = BatchRequest(prompt=prompt, max_new_tokens=8, seed=9)
        req2.cancelled.set()
        out2 = b.submit(req2)
        assert out2.get(timeout=60) is None

        # 3. abandoned streaming consumer (the engine/server path)
        session = BatcherSession(b)
        gen = session.generate_stream(
            prompt, jax.random.PRNGKey(3), max_new_tokens=200
        )
        next(gen)
        gen.close()  # sets req.cancelled via the finally
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            if b.stats()["active_slots"] == 0:
                break
            time.sleep(0.05)
        assert b.stats()["active_slots"] == 0, "abandoned stream kept its slot"

        # pool recovered: a fresh request runs its exact (masked) budget
        out3 = b.generate(prompt, max_new_tokens=6, seed=11)
        assert out3.shape[1] == 6
    finally:
        b.shutdown()


@pytest.mark.parametrize("kv_quant,prefix,chunk,admit_every", [
    (False, 0, 4, 4),
    (True, 4, 4, 4),
    # 1-step sub-chunks over an 8-step chunk: maximum interrupt pressure —
    # 2-deep pipelining, overlapped mid-chunk admissions, and freed slots
    # re-owned while older sub-chunks are still in flight (the per-entry
    # owner-snapshot gating in `_run_chunk` is what keeps the bit-equality
    # assertion below true here)
    (False, 0, 8, 1),
])
def test_randomized_soak(kv_quant, prefix, chunk, admit_every):
    """Randomized concurrency soak over every pool path at once: a burst
    of clients with random prompt lengths (buckets 64 and 128 interleaved,
    so `_group_plan` emits full, padded, and single admission groups),
    random budgets/seeds, submitted from threads with random jitter while
    a third of the consumers abandon their stream mid-flight. Asserts
    every stream terminates within the deadline, the pool drains clean
    (no active slots, empty queue, no parked rows, worker alive), and
    every surviving output is bit-equal to a solo rerun with the same
    seed — pool traffic, admission grouping, parking, and neighboring
    cancellations must not leak into any row's sampling stream. The
    second variant soaks the int8-KV pool with the prefix store armed.

    im_end is masked (bench-style) so stream lengths are exact budgets:
    a short stream can only mean a lost chunk or a cancel leak. (This
    caught a real one: `_sample_column_rows` didn't apply mask_im_end,
    so pool rows could draw im_end and end short under load.)"""
    import time

    from fish_speech_tpu.engine.batcher import BatcherSession

    # same dims as test_mixed_length_padded_group_admission: the jit cache
    # already holds these signatures when the suite runs in one process
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3,
        max_seq_len=192,
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(mask_im_end=True), pool_size=6,
        dtype=jnp.float32, decode_chunk_size=chunk,
        kv_quant=kv_quant, prefix_cache_size=prefix,
        admit_every=admit_every,
    )
    session = BatcherSession(b)
    rng = np.random.default_rng(1234)
    n_clients = 15
    lengths = rng.integers(5, 90, size=n_clients)
    budgets = rng.integers(3, 11, size=n_clients)
    cancel_at = {  # client -> chunks consumed before abandoning (-1: never)
        i: (int(rng.integers(0, 2)) if i % 3 == 0 else -1)
        for i in range(n_clients)
    }
    prompts = [
        random_prompt(cfg, int(t), np.random.default_rng(500 + i))
        for i, t in enumerate(lengths)
    ]
    keys = [jax.random.PRNGKey(1000 + i) for i in range(n_clients)]
    results: dict = {}
    errors: dict = {}

    def client(i):
        try:
            time.sleep(float(rng.integers(0, 20)) / 1000.0)
            gen = session.generate_stream(
                prompts[i], keys[i], max_new_tokens=int(budgets[i])
            )
            if cancel_at[i] >= 0:
                for _ in range(cancel_at[i]):
                    next(gen)
                gen.close()
                results[i] = None
                return
            last = None
            for last in gen:
                pass
            results[i] = last
        except BaseException as e:  # surfaced below, not swallowed
            errors[i] = e

    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert not errors, f"client errors: {errors}"
        assert len(results) == n_clients, "a client never terminated"

        # pool drains clean once every stream is done or reaped
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            s = b.stats()
            if s["active_slots"] == 0 and s["queued"] == 0 \
                    and s["parked_rows"] == 0:
                break
            time.sleep(0.05)
        s = b.stats()
        assert s["active_slots"] == 0, s
        assert s["queued"] == 0, s
        assert s["parked_rows"] == 0, s
        assert s["worker_alive"], "worker thread died during the soak"

        # survivors: exact budget length + bit-equal to a solo rerun
        for i, out in results.items():
            if out is None:
                continue
            assert out.shape == (cfg.num_codebooks + 1, int(budgets[i])), (
                f"client {i}: {out.shape} vs budget {budgets[i]}"
            )
            # sampling params must match generate_stream's defaults
            # (BatchRequest's own defaults are the reference's 0.8/0.8)
            solo = b.generate(
                prompts[i], max_new_tokens=int(budgets[i]),
                temperature=1.0, top_p=0.9, top_k=30,
                seed=BatcherSession._seed_of(keys[i]),
            )
            np.testing.assert_array_equal(out, solo, err_msg=f"client {i}")
    finally:
        b.shutdown()


def test_admit_front_loads_all_park_groups():
    """A cold burst's admission pass parks EVERY overflow group up to the
    parked-row budget in one `_admit` call (round 3 parked one group per
    pass with a full decode chunk between parks, which pushed the last
    class's first audio to 2.53 s in the mixed burst — VERDICT r3 item 6).
    Every parked client must have its first frame in its queue right after
    the pass."""
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3, max_seq_len=128
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(), pool_size=2, dtype=jnp.float32,
        decode_chunk_size=4,
    )
    try:
        b.shutdown()  # drive the admission internals single-threaded
        reqs = [
            BatchRequest(prompt=random_prompt(cfg, 10 + 60 * (i % 2)),
                         max_new_tokens=6, seed=i)
            for i in range(8)  # mixed 64-/128-token buckets
        ]
        for r in reqs:
            b.pending.put(r)
        b._admit()
        # 2 direct admissions; the remaining 6 park up to park_max_rows=4
        # ALL IN THIS PASS (pool cap 2 -> single-row groups)
        assert sum(s.active for s in b.slots) == 2
        assert len(b.parked) == 4, [pk.rows_alloc for pk in b.parked]
        assert len(b._overflow) == 2  # budget-bound tail still waits
        for pk in b.parked:
            for req in pk.reqs:
                assert not req.out.empty(), (
                    "parked request missing its admission first frame"
                )
    finally:
        b.shutdown()


def test_batcher_precompile_covers_admission_signatures():
    """`precompile` AOT-builds the same (k, bucket) park/scatter and
    (chunk, kv) decode signatures the pool dispatches, and a burst right
    after it produces valid outputs (the programs land in the persistent
    cache; the real calls then re-trace against it)."""
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3, max_seq_len=128
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(), pool_size=4, dtype=jnp.float32,
        decode_chunk_size=4,
    )
    try:
        times = b.precompile()
        names = set(times)
        # default buckets = every PROMPT_BUCKET below max_seq_len (64);
        # pool 4 -> group sizes {1, 4}
        for k in (1, 4):
            assert f"park_{k}@64" in names and f"scatter_{k}@64" in names
        assert any(n.startswith("decode_4@") for n in names)
        outs = [b.generate(random_prompt(cfg, 10), max_new_tokens=6, seed=i)
                for i in range(2)]
        for out in outs:
            _check(cfg, out)
    finally:
        b.shutdown()


def test_batcher_aot_dispatch_and_serving_guard():
    """After precompile, the worker loop dispatches decode/park/scatter
    through the registered AOT executables (not the jit path) and outputs
    match a jit-only batcher with the same seeds. precompile(execute=True)
    refuses to run while requests are in flight (it donates the live pool)."""
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3, max_seq_len=128
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    prompts = [random_prompt(cfg, 10, np.random.default_rng(i)) for i in range(3)]

    def run(precompiled):
        b = ContinuousBatcher(
            params, cfg, SamplingConfig(), pool_size=4, dtype=jnp.float32,
            decode_chunk_size=4,
        )
        try:
            if precompiled:
                b.precompile()
                assert any(k[0] == "decode" for k in b._aot)
                assert any(k[0] == "park" for k in b._aot)
                assert any(k[0] == "scatter" for k in b._aot)
                # the dispatch sites must actually HIT the registry: count
                # AOT executions by wrapping every registered executable
                hits = {"n": 0}
                orig = dict(b._aot)

                def wrap(fn):
                    def inner(*a):
                        hits["n"] += 1
                        return fn(*a)
                    return inner

                b._aot = {k: wrap(v) for k, v in orig.items()}
                outs = [b.generate(p, max_new_tokens=6, seed=7 + i)
                        for i, p in enumerate(prompts)]
                assert hits["n"] > 0, "worker loop never dispatched via AOT"
                b._aot = orig
                return outs
            return [b.generate(p, max_new_tokens=6, seed=7 + i)
                    for i, p in enumerate(prompts)]
        finally:
            b.shutdown()

    aot_outs = run(True)
    jit_outs = run(False)
    for a, j in zip(aot_outs, jit_outs):
        np.testing.assert_array_equal(a, j)

    # guard: execute=True while a request is in flight must fail loudly
    # (slot marked active directly — submitting a real request would race
    # the tiny model's own completion against the precompile call)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(), pool_size=4, dtype=jnp.float32,
        decode_chunk_size=4,
    )
    try:
        b.slots[0].active = True
        with pytest.raises(RuntimeError, match="donates the live pool"):
            b.precompile(execute=True)
        b.slots[0].active = False
    finally:
        b.shutdown()


def test_batcher_stale_aot_entry_evicted_falls_back_to_jit():
    """A stale AOT entry (wrong operand signature) warns once, is evicted,
    and the request still completes correctly via the jit path."""
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3, max_seq_len=128
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(), pool_size=2, dtype=jnp.float32,
        decode_chunk_size=4,
    )
    try:
        def boom(*a):
            raise ValueError("stale executable")

        stale_keys = [("decode", n, kv) for n in (4,)
                      for kv in b.kv_buckets]
        for k in stale_keys:
            b._aot[k] = boom
        with pytest.warns(UserWarning, match="evicted"):
            out = b.generate(random_prompt(cfg, 10), max_new_tokens=6, seed=3)
        _check(cfg, out)
        for k in stale_keys:
            assert k not in b._aot  # evicted, later chunks go straight to jit
    finally:
        b.shutdown()


def test_subchunk_pipelining_matches_monolithic_and_admits_mid_chunk():
    """Round-5 worker: `_run_chunk` dispatches a long decode chunk as
    pipelined sub-chunks (`admit_every`) with up to two in flight and
    early-exits to `_admit` when a request arrives mid-chunk.

    (a) Token streams are IDENTICAL to the monolithic worker
        (admit_every=0): sub-chunking only changes dispatch granularity,
        never the math (per-request keys are seed-derived, decode chunking
        is length-invariant).
    (b) A request submitted while the pool is mid-way through a long
        chunk gets its first frame well before the in-progress request's
        chunk budget drains — the monolithic worker could not admit until
        the full chunk finished.
    """
    import time

    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3,
        max_seq_len=512,
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.float32)
    prompt_a = random_prompt(cfg, 12, np.random.default_rng(1))
    prompt_b = random_prompt(cfg, 12, np.random.default_rng(2))

    outs = {}
    for tag, admit_every in (("mono", 0), ("sub", 4)):
        b = ContinuousBatcher(
            params, cfg, SamplingConfig(mask_im_end=True), pool_size=2,
            dtype=jnp.float32, decode_chunk_size=64, first_chunk_size=4,
            admit_every=admit_every,
        )
        try:
            ra = BatchRequest(prompt=prompt_a, max_new_tokens=200, seed=5)
            b.submit(ra)
            first_a = ra.out.get(timeout=120)  # A is streaming
            # stagger the second submission so it lands MID-plan (the
            # early-exit path `_run_chunk` must abandon the remaining
            # sub-chunks without draining an already-empty in-flight
            # queue — the round-5 crash found on the real chip)
            time.sleep(0.05)
            t0 = time.perf_counter()
            rb = BatchRequest(prompt=prompt_b, max_new_tokens=32, seed=6)
            b.submit(rb)
            first_b = rb.out.get(timeout=120)
            ttfa_b = time.perf_counter() - t0
            chunks = {"a": [first_a], "b": [first_b]}
            for k, r in (("a", ra), ("b", rb)):
                while True:
                    item = r.out.get(timeout=120)
                    if item is None:
                        break
                    assert not isinstance(item, BaseException), item
                    chunks[k].append(item)
            outs[tag] = {
                k: np.concatenate(v, axis=0) for k, v in chunks.items()
            }
            outs[tag]["ttfa_b"] = ttfa_b
        finally:
            b.shutdown()

    np.testing.assert_array_equal(outs["mono"]["a"], outs["sub"]["a"])
    np.testing.assert_array_equal(outs["mono"]["b"], outs["sub"]["b"])
    # responsiveness: B's admission must not have waited for A's full
    # 64-step chunk — with sub-chunks of 4 it waits <=2 sub-chunks plus
    # its own prefill. Generous CPU-timing margin: a full chunk after the
    # early-exit fix never runs while B waits, so sub must beat mono's
    # structural floor rather than a wall-clock constant.
    assert outs["sub"]["ttfa_b"] < outs["mono"]["ttfa_b"], (
        outs["sub"]["ttfa_b"], outs["mono"]["ttfa_b"],
    )


def test_overload_keeps_full_chunks_when_admission_blocked():
    """The sub-chunk early exit is GATED on `_admit_possible`: a request
    that arrives while the pool is full AND the parked-row budget is
    exhausted cannot be placed, so abandoning the chunk's remaining
    sub-chunks would buy nothing but pipeline drains (one exposed fetch
    RTT per abandoned chunk). Observable contract: while blocked, the
    worker runs ~one `_admit` pass per FULL chunk plan (4 sub-chunk
    dispatches at chunk=8/admit_every=2), not one per sub-chunk."""
    import time

    cfg = dual_ar_tiny(
        # wide semantic range: im_end draws at the admission PREFILL are
        # ~2e-4/request (mask_im_end only governs pool decode), so the
        # park budget deterministically fills with these seeds
        semantic_begin_id=300, semantic_end_id=4395, im_end_id=3,
        codebook_size=4096, max_seq_len=2048,
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.float32)
    rng = np.random.default_rng(7)
    b = ContinuousBatcher(
        params, cfg, SamplingConfig(mask_im_end=True), pool_size=2,
        dtype=jnp.float32, decode_chunk_size=8, first_chunk_size=2,
        admit_every=2,
    )
    orig_admit = orig_dispatch = None
    reqs, blocked = [], None
    try:
        # 2 fill the pool, 4 exhaust the parked-row budget (2x pool)
        reqs = [BatchRequest(prompt=random_prompt(cfg, 12, rng),
                             max_new_tokens=1500, seed=i)
                for i in range(6)]
        for r in reqs:
            b.submit(r)
        for r in reqs:  # every request streamed its prefill first frame
            assert r.out.get(timeout=120) is not None
        # wait for the parked-row budget itself: `queued` drops to 0 the
        # moment the last overflow request enters its park-group prefill,
        # BEFORE its parked entry lands (observed race)
        deadline = time.time() + 60
        while time.time() < deadline:
            if (all(s.active for s in b.slots) and
                    sum(pk.rows_alloc for pk in b.parked)
                    >= b.park_max_rows):
                break
            time.sleep(0.02)
        assert sum(pk.rows_alloc for pk in b.parked) >= b.park_max_rows

        counts = {"admit": 0, "dispatch": 0}
        orig_admit, orig_dispatch = b._admit, b._dispatch_decode

        def admit_counted():
            counts["admit"] += 1
            return orig_admit()

        def dispatch_counted(*a, **kw):
            counts["dispatch"] += 1
            return orig_dispatch(*a, **kw)

        b._admit = admit_counted
        b._dispatch_decode = dispatch_counted
        # arrives mid-decode; pool full + park budget exhausted means
        # _admit_possible() is False -> the worker must NOT abandon chunks
        blocked = BatchRequest(prompt=random_prompt(cfg, 12, rng),
                               max_new_tokens=8, seed=99)
        b.submit(blocked)
        deadline = time.time() + 60
        while counts["dispatch"] < 24 and time.time() < deadline:
            time.sleep(0.02)
        assert counts["dispatch"] >= 24, counts
        # full chunks: ~4 dispatches per admit pass (allow margin for the
        # passes bracketing the instrumentation window)
        assert counts["dispatch"] >= 3 * counts["admit"], counts
    finally:
        if orig_admit is not None:
            b._admit = orig_admit
            b._dispatch_decode = orig_dispatch
        for r in reqs:
            r.cancelled.set()
        if blocked is not None:
            blocked.cancelled.set()
        b.shutdown()


def test_negative_admit_every_rejected_at_construction():
    """A negative admit_every would make _chunk_plan return an empty plan
    and the worker busy-spin while admitted streams never decode — it must
    fail loudly at construction instead."""
    cfg = dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3,
        max_seq_len=128,
    )
    params = dual_ar.init_dual_ar(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.float32)
    with pytest.raises(ValueError, match="admit_every"):
        ContinuousBatcher(
            params, cfg, SamplingConfig(), pool_size=2, dtype=jnp.float32,
            decode_chunk_size=4, admit_every=-1,
        )
