"""One simulated host of the 2-process CPU multi-host SERVING smoke test.

Launched by `tests/test_multihost.py` as `python multihost_serving_worker.py
<port> <pid>` with XLA_FLAGS forcing ONE virtual CPU device per process: the
two processes form a (dp=1, tp=2) global mesh via the server's own
`--coordinator` bootstrap (`server.main.build_engine(multihost=True)` shards
the LM with `parallel.mesh.host_shard`). Host 0 is the HTTP-facing leader —
here it drives `TTSInferenceEngine.inference` directly (the same calls the
aiohttp handlers make) with `server.multihost.wrap_leader` broadcasting each
generation; host 1 runs `server.multihost.follower_loop`, replaying the
request stream in SPMD lockstep. The leader prints a digest of each
request's final audio; the parent compares against an unsharded
single-process engine built from the identical `--tiny` args.
"""

import hashlib
import sys

import numpy as np


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from fish_speech_tpu.parallel.mesh import init_distributed

    assert init_distributed(f"localhost:{port}", num_hosts=2, host_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 2

    from fish_speech_tpu.server import multihost as mh
    from fish_speech_tpu.server.main import build_engine, parse_args

    engine = build_engine(parse_args(WORKER_ARGS), multihost=True)
    cfg = engine.session.cfg
    sharded_leaves = sum(
        not leaf.is_fully_replicated
        for leaf in jax.tree_util.tree_leaves(engine.session.params)
    )
    assert sharded_leaves > 0, "no param was partitioned over the tp axis"

    if pid == 0:
        mh.wrap_leader(engine.session, cfg)
        for seed in (7, 8):
            digest = run_request(engine, seed)
            print(f"RESULT pid=0 seed={seed} audio={digest}", flush=True)
        # streaming request: leader takes the host per-chunk path
        # (device_partials is disabled for multi-host leaders) and the
        # follower replays the identical dispatch sequence
        digest = run_streaming_request(engine, 9)
        print(f"RESULT pid=0 stream seed=9 audio={digest}", flush=True)
        # abandoned stream: close after the first audio segment — the
        # wrap_leader drain must dispatch the remaining decode chunks so
        # lockstep survives for the NEXT request
        run_streaming_request(engine, 10, abandon_after=1)
        digest = run_request(engine, 11)
        print(f"RESULT pid=0 seed=11 audio={digest}", flush=True)
        mh.broadcast_stop(engine.session, cfg)
    else:
        served = mh.follower_loop(engine.session, cfg)
        assert served >= 5, f"follower replayed only {served} generations"
        print(f"RESULT pid=1 served={served}", flush=True)


# identical args build the multi-host engine (workers) and the unsharded
# single-process reference engine (parent test)
WORKER_ARGS = ["--tiny", "--cpu", "--no-warmup", "--decode-chunk-size", "8"]


def run_request(engine, seed: int) -> str:
    """One non-streaming TTS request; returns a digest of the final audio
    (identical tokens + identical process-local codec => identical bytes)."""
    from fish_speech_tpu.engine.tts import TTSRequest

    final = None
    for result in engine.inference(
        TTSRequest(text="Hello world.", max_new_tokens=16, seed=seed)
    ):
        if result.code == "error":
            raise result.error
        if result.code == "final":
            final = result.audio[1]
    assert final is not None, "no final audio"
    return hashlib.sha256(final.tobytes()).hexdigest()[:16]


def run_streaming_request(engine, seed: int, abandon_after: int = 0) -> str:
    """One STREAMING TTS request; returns a digest of the concatenated
    segment chunks. abandon_after > 0 closes the stream after that many
    segments (simulated client disconnect) — the leader wrapper must then
    drain the remaining decode chunks to keep follower lockstep."""
    import hashlib as _hashlib

    from fish_speech_tpu.engine.tts import TTSRequest

    gen = engine.inference(
        TTSRequest(text="Hello world.", max_new_tokens=16, seed=seed,
                   streaming=True)
    )
    chunks = []
    try:
        for result in gen:
            if result.code == "error":
                raise result.error
            if result.code == "segment":
                chunks.append(result.audio[1])
                if abandon_after and len(chunks) >= abandon_after:
                    break
    finally:
        gen.close()
    assert chunks, "no streamed audio segments"
    return _hashlib.sha256(
        b"".join(np.ascontiguousarray(c).tobytes() for c in chunks)
    ).hexdigest()[:16]


if __name__ == "__main__":
    main()
