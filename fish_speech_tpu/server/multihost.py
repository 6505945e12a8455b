"""Multi-host serving: one server process per host, the model sharded
over the global (dp=1, tp=all-devices) mesh.

The reference has no multi-node serving of its own (its serving headline
rides SGLang; `/root/reference/tools/server/views.py` is single-process) —
here multi-host works the JAX way: every process holds the same weights,
`parallel.mesh.host_shard` lays them out over the global mesh, and GSPMD
inserts the collectives. What the framework must add is REQUEST lockstep:
a jitted step over process-spanning arrays only runs when every process
dispatches it, so each generation request must be replayed on every host
in the same order.

  - Host 0 (the leader) faces HTTP. `wrap_leader(session)` intercepts
    `generate_stream`: before the first chunk it broadcasts a fixed-shape
    request descriptor to all hosts, then delegates to the real stream —
    and on early abandonment (client disconnect / cancel) it DRAINS the
    rest of the stream so the leader never falls out of lockstep with
    followers that run every request to completion.
  - Hosts 1..N-1 run `follower_loop(session)`: receive descriptors,
    replay `session.generate_stream(...)` to exhaustion with identical
    arguments — including the streaming-path kwargs (pipeline_lookahead,
    device_partials), so the follower walks the exact same dispatch
    sequence — and exit on the stop descriptor (broadcast by the
    leader's shutdown path). Per-request errors are logged and survived,
    mirroring the leader's engine-layer catch.

Everything downstream of the LM — codec decode, transcoding, HTTP — runs
on the leader only: those touch process-LOCAL arrays, and JAX's SPMD
contract only constrains the order of computations on process-spanning
(sharded) arrays. Prefix caching stays coherent because each host's LRU
evolves as a deterministic function of the same request sequence.

Proven by `tests/test_multihost.py::test_two_process_serving_matches_single_process`
(2 processes x 2 virtual CPU devices, gloo collectives): leader+follower
token output is byte-identical to an unsharded single-process run.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_STOP, _GENERATE = 0, 1


def _schema(cfg):
    """Fixed-shape descriptor every host agrees on (broadcast_one_to_all
    requires identical pytree structure + shapes on all processes)."""
    return {
        "kind": np.zeros((), np.int32),
        "prompt": np.zeros((cfg.num_codebooks + 1, cfg.max_seq_len),
                           np.int32),
        "plen": np.zeros((), np.int32),
        "max_new_tokens": np.zeros((), np.int32),
        "temperature": np.zeros((), np.float32),
        "top_p": np.zeros((), np.float32),
        "top_k": np.zeros((), np.int32),
        "key": np.zeros((2,), np.uint32),
        # streaming-path kwargs: the follower must replay the EXACT same
        # generate_stream code path (device_partials dispatches one decode
        # chunk per yield and stops at the chunk containing im_end; the
        # host path with lookahead>0 keeps extra chunks in flight past
        # im_end) — a path mismatch desyncs the dispatch counts and hangs
        # the mesh on the first streaming request
        "lookahead": np.zeros((), np.int32),
        "device_partials": np.zeros((), np.int32),
    }


def _broadcast(desc: Optional[dict], cfg) -> dict:
    """All-host rendezvous: leader's descriptor (host 0) wins; followers
    pass the zero schema. Returns host-local numpy values."""
    from jax.experimental import multihost_utils

    out = multihost_utils.broadcast_one_to_all(desc or _schema(cfg))
    return {k: np.asarray(v) for k, v in out.items()}


def _key_data(key) -> np.ndarray:
    import jax

    raw = np.asarray(jax.random.key_data(key)).reshape(-1)
    assert raw.size == 2, f"unexpected PRNG key layout {raw.shape}"
    return raw.astype(np.uint32)


def wrap_leader(session, cfg) -> None:
    """Instrument `session.generate_stream` (host 0 only) to broadcast
    each request before streaming and to drain abandoned streams."""
    orig = session.generate_stream

    def generate_stream(prompt, key, max_new_tokens=0, temperature=1.0,
                        top_p=0.9, top_k=30, audio_features=None,
                        audio_mask=None, pipeline_lookahead=0,
                        device_partials=False, **kw):
        if audio_features is not None:
            raise NotImplementedError(
                "audio-feature conditioning is not broadcast to follower "
                "hosts yet; run conditioned models single-host")
        prompt = np.asarray(prompt, np.int32)
        desc = _schema(cfg)
        desc["kind"] += _GENERATE
        desc["prompt"][:, : prompt.shape[1]] = prompt
        desc["plen"] += prompt.shape[1]
        desc["max_new_tokens"] += int(max_new_tokens)
        desc["temperature"] += np.float32(temperature)
        desc["top_p"] += np.float32(top_p)
        desc["top_k"] += int(top_k)
        desc["key"] += _key_data(key)
        desc["lookahead"] += int(pipeline_lookahead)
        desc["device_partials"] += int(bool(device_partials))
        _broadcast(desc, cfg)
        gen = orig(prompt, key, max_new_tokens=max_new_tokens,
                   temperature=temperature, top_p=top_p, top_k=top_k,
                   pipeline_lookahead=pipeline_lookahead,
                   device_partials=device_partials, **kw)
        try:
            # NOT `yield from`: a consumer close() (disconnect / cancel)
            # would propagate GeneratorExit THROUGH the delegation and
            # close `gen` before the finally ran, making the drain a no-op
            # — the exact lockstep bug this wrapper exists to prevent
            for item in gen:
                yield item
        finally:
            # keep lockstep: followers run every request to completion, so
            # an abandoned leader stream (disconnect, cancel) must still
            # dispatch its remaining decode chunks
            for _ in gen:
                pass

    session.generate_stream = generate_stream
    session._multihost_leader = True


def broadcast_stop(session, cfg) -> None:
    """Leader shutdown: release the followers' receive rendezvous."""
    if getattr(session, "_multihost_leader", False):
        _broadcast(_schema(cfg), cfg)  # kind stays _STOP
        session._multihost_leader = False


def follower_loop(session, cfg) -> int:
    """Replay the leader's request stream until the stop descriptor.
    Returns the number of requests served (for tests/logging)."""
    import jax

    served = 0
    while True:
        desc = _broadcast(None, cfg)
        if int(desc["kind"]) == _STOP:
            logger.info("follower: stop received after %d requests", served)
            return served
        prompt = desc["prompt"][:, : int(desc["plen"])]
        try:
            # the repo uses old-style uint32 (2,) PRNG keys throughout;
            # every jax.random op accepts the raw array directly. Replay
            # through generate_stream with the leader's broadcast kwargs
            # so the device-dispatch sequence (chunk count, partial
            # fetches, device concatenates) is identical to the leader's.
            stream = session.generate_stream(
                prompt, jax.numpy.asarray(desc["key"]),
                max_new_tokens=int(desc["max_new_tokens"]),
                temperature=float(desc["temperature"]),
                top_p=float(desc["top_p"]),
                top_k=int(desc["top_k"]),
                pipeline_lookahead=int(desc["lookahead"]),
                device_partials=bool(int(desc["device_partials"])),
            )
            for _ in stream:
                pass
        except Exception:
            # mirror the leader, which catches per-request errors at the
            # engine layer and keeps serving: a deterministic validation
            # error raises on both sides BEFORE any device dispatch, so
            # surviving it here preserves lockstep — exiting would leave
            # every later leader dispatch without a peer (permanent hang)
            logger.exception("follower: request %d replay failed", served)
        served += 1
