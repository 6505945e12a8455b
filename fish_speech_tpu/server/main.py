"""API server entry point.

    python -m fish_speech_tpu.server.main \
        --checkpoint-path checkpoints/s2-pro-tpu \
        --listen 127.0.0.1:8080

`--tiny` starts with random tiny models (no checkpoint needed) — used for
smoke tests and demos. Parity with `tools/api_server.py` flags.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

logger = logging.getLogger("fish_speech_tpu.server")


def build_engine(args, multihost: bool = False):
    import jax
    import jax.numpy as jnp

    from fish_speech_tpu.config import SamplingConfig, dac_tiny, dual_ar_tiny
    from fish_speech_tpu.engine.tts import TTSInferenceEngine
    from fish_speech_tpu.generate import GenerationSession
    from fish_speech_tpu.models.dac import init_dac
    from fish_speech_tpu.models.dual_ar import init_dual_ar
    from fish_speech_tpu.tokenizer import FishTokenizer, build_test_tokenizer
    from fish_speech_tpu.utils.checkpoint import load_dac, load_dual_ar

    if args.tiny:
        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        tokenizer = build_test_tokenizer()
        dac_cfg = dac_tiny()
        cfg = dual_ar_tiny(
            vocab_size=tokenizer.vocab_size,
            semantic_begin_id=tokenizer.semantic_begin_id,
            semantic_end_id=tokenizer.semantic_end_id,
            im_end_id=tokenizer.im_end_id,
            codebook_size=4096,
            num_codebooks=dac_cfg.rvq.total_codebooks,
        )
        dtype = jnp.float32
        params = init_dual_ar(jax.random.PRNGKey(0), cfg, dtype=dtype)
        dac_params = init_dac(jax.random.PRNGKey(1), dac_cfg, dtype=dtype)
    else:
        dtype = jnp.float16 if args.half else jnp.bfloat16
        params, cfg = load_dual_ar(args.checkpoint_path, dtype=dtype)
        tokenizer = FishTokenizer.from_pretrained(args.checkpoint_path)
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            semantic_begin_id=tokenizer.semantic_begin_id,
            semantic_end_id=tokenizer.semantic_end_id,
            im_end_id=tokenizer.im_end_id,
        ).resolve()
        dac_params, dac_cfg = load_dac(
            args.decoder_checkpoint_path or args.checkpoint_path, dtype=dtype
        )

    if args.int8:
        from fish_speech_tpu.ops.quant import quantize_dual_ar_lowmem

        params = quantize_dual_ar_lowmem(params, mode="int8")

    mesh = None
    if multihost or jax.device_count() > jax.local_device_count():
        # multi-host serving: shard the LM over the GLOBAL (dp=1, tp=all)
        # mesh BEFORE the session builds (its head-preslice then runs on
        # sharded params; w13 fusion auto-skips multidevice params). The
        # codec and tokenizer stay process-local — only host 0 runs them.
        from fish_speech_tpu.parallel.mesh import (dual_ar_param_specs,
                                                   host_shard, make_mesh)

        if args.pool_size > 1:
            raise NotImplementedError(
                "multi-host serving drives the single-stream session; "
                "continuous batching across hosts is not wired yet "
                "(--pool-size 1)")
        if args.int8:
            raise NotImplementedError(
                "int8 leaves have no multi-host partition specs yet; "
                "serve multi-host in bf16")
        mesh = make_mesh(jax.devices(), dp=1, tp=jax.device_count())
        params = host_shard(params, dual_ar_param_specs(cfg), mesh)

    if args.pool_size > 1:
        from fish_speech_tpu.engine.batcher import BatcherSession, ContinuousBatcher

        batcher = ContinuousBatcher(
            params, cfg, SamplingConfig(), pool_size=args.pool_size,
            dtype=dtype, decode_chunk_size=args.decode_chunk_size,
            first_chunk_size=8, kv_quant=args.kv_int8,
            prefix_cache_size=args.prefix_cache,
            admit_every=args.admit_every,
        )
        session = BatcherSession(batcher)
    else:
        session = GenerationSession(
            params, cfg, SamplingConfig(), max_batch=1, dtype=dtype,
            decode_chunk_size=args.decode_chunk_size,
            # small first chunk: first audio reaches the codec after ~8
            # frames instead of a full chunk (time-to-first-audio)
            first_chunk_size=8, kv_quant=args.kv_int8,
            prefix_cache_size=args.prefix_cache,
        )
    if mesh is not None:
        from fish_speech_tpu.parallel.mesh import host_shard, kv_cache_specs

        session.cache = host_shard(
            session.cache, kv_cache_specs(quant=args.kv_int8), mesh
        )
    # the single-stream session holds a fused-w13 weight copy; drop our
    # reference so the split originals free before warmup
    del params
    engine = TTSInferenceEngine(
        session, tokenizer, dac_params, dac_cfg,
        references_dir=args.references_dir,
    )
    return engine


def warm_up(engine):
    """Full synthesis pass at startup: triggers prefill + decode + codec
    compiles so the first request is fast (reference
    `model_manager.py:80-93`). With a pooled session, also fires a
    concurrent burst so the group-admission prefill shapes (k in {16,4,1})
    compile now instead of on the first production burst."""
    import threading

    from fish_speech_tpu.engine.tts import TTSRequest

    t0 = time.time()
    if getattr(engine.session, "concurrent", False):
        # parallel AOT of every admission/decode signature first — the
        # warmup burst below then dispatches against a hot persistent
        # cache instead of compiling each program serially
        times = engine.session.batcher.precompile()
        logger.info("Batcher precompile (parallel): %.1fs over %d programs",
                    time.time() - t0, len(times))
    for result in engine.inference(TTSRequest(text="Hello world.", max_new_tokens=32)):
        if result.code == "error":
            raise RuntimeError(f"Warmup failed: {result.error}")

    if getattr(engine.session, "concurrent", False):
        pool = engine.session.batcher.pool_size
        n_burst = min(pool, 16) + (4 if pool > 4 else 0) + 1
        errors = []

        def one(i):
            try:
                for r in engine.inference(
                    TTSRequest(text="Warm up the admission pool.",
                               max_new_tokens=16, seed=i)
                ):
                    if r.code == "error":
                        errors.append(r.error)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=one, args=(i,)) for i in range(n_burst)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        if errors:
            raise RuntimeError(f"Pool warmup failed: {errors[0]}")
    logger.info("Warmup finished in %.1fs", time.time() - t0)


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-path", type=str, default="checkpoints/s2-pro-tpu")
    parser.add_argument("--decoder-checkpoint-path", type=str, default=None)
    parser.add_argument("--listen", type=str, default="127.0.0.1:8080")
    parser.add_argument("--api-key", type=str, default=None)
    parser.add_argument("--half", action="store_true")
    parser.add_argument("--max-text-length", type=int, default=0)
    parser.add_argument("--max-inflight", type=int, default=0,
                        help="cap concurrent /v1/tts requests; excess gets "
                             "503 + Retry-After instead of queueing "
                             "unboundedly (0 = unlimited)")
    parser.add_argument("--references-dir", type=str, default="references")
    parser.add_argument("--decode-chunk-size", type=int, default=64)
    parser.add_argument("--pool-size", type=int, default=1,
                        help=">1 enables continuous batching: a shared "
                             "decode pool serving this many streams")
    parser.add_argument("--admit-every", type=int, default=4,
                        help="pooled decode sub-chunk length: the worker "
                             "checks for new arrivals every this many "
                             "steps (two sub-chunks pipelined so the "
                             "device stays back-to-back); 0 = monolithic "
                             "--decode-chunk-size dispatches")
    parser.add_argument("--prefix-cache", type=int, default=4,
                        help="voice-clone prefix cache entries (0 disables)"
                             ": repeat-speaker requests restore the "
                             "reference prompt's KV and prefill only the "
                             "user text; with --pool-size, same-speaker "
                             "admission groups reuse it too")
    parser.add_argument("--kv-int8", action="store_true",
                        help="int8 KV cache (halves decode KV reads; "
                             "+9%% at long-context serving)")
    parser.add_argument("--int8", action="store_true",
                        help="int8 weight-only quantization at load")
    parser.add_argument("--tiny", action="store_true",
                        help="random tiny models (smoke test)")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--no-warmup", action="store_true")
    parser.add_argument("--coordinator", default=None,
                        help="multi-host serving: jax.distributed "
                             "coordinator host:port; run one process per "
                             "host, model sharded over the global mesh "
                             "(HTTP should face host 0)")
    parser.add_argument("--num-hosts", type=int, default=None)
    parser.add_argument("--host-id", type=int, default=None)
    return parser.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    args = parse_args(argv)

    # must precede any compile: warm_up's parallel AOT precompile only
    # helps when the later jit dispatch finds the program in this cache
    from fish_speech_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from fish_speech_tpu.parallel.mesh import init_distributed

    multihost = init_distributed(args.coordinator, args.num_hosts,
                                 args.host_id)

    from aiohttp import web

    from fish_speech_tpu.server.app import create_app

    engine = build_engine(args, multihost=multihost)

    if multihost:
        from fish_speech_tpu.server import multihost as mh

        if args.host_id != 0:
            # followers never face HTTP: replay the leader's request
            # stream in SPMD lockstep until the stop descriptor
            mh.follower_loop(engine.session, engine.session.cfg)
            return
        mh.wrap_leader(engine.session, engine.session.cfg)

    if not args.no_warmup:
        warm_up(engine)

    app = create_app(engine, api_key=args.api_key,
                     max_text_length=args.max_text_length,
                     max_inflight=args.max_inflight)

    async def _drain_pool(app_):
        # graceful SIGTERM/SIGINT: stop the batcher worker between chunks
        # (its own daemon-thread teardown mid-device-call is ugly and can
        # segfault the runtime); registered here, not in create_app, so
        # test clients can tear apps down without killing a shared engine
        batcher = getattr(engine.session, "batcher", None)
        if batcher is not None:
            batcher.shutdown()
        if multihost:
            from fish_speech_tpu.server import multihost as mh

            mh.broadcast_stop(engine.session, engine.session.cfg)

    app.on_cleanup.append(_drain_pool)
    host, port = args.listen.rsplit(":", 1)
    logger.info("Serving on http://%s:%s", host, port)
    # handler_cancellation: aiohttp >= 3.9 no longer cancels handlers when
    # the peer disconnects unless asked; without it a dropped client's
    # generation runs its whole token budget (the /v1/tts handler converts
    # the cancellation into a cancel event the engine polls per chunk)
    web.run_app(app, host=host, port=int(port), print=None,
                handler_cancellation=True)


if __name__ == "__main__":
    main()
