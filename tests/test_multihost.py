"""Multi-host training smoke test: 2 processes x 2 virtual CPU devices.

Validates the `--coordinator/--num-hosts/--host-id` wiring end to end
(`parallel.mesh.init_distributed` -> gloo collectives ->
`Trainer._place_batch` assembling the global dp batch from per-host rows ->
one real train step whose gradient psum spans both processes), and that the
multi-host result MATCHES a single-process 4-device run on the identical
global batch — i.e. multi-host is numerically the same program, just laid
out across hosts. (The reference gets multi-node through Lightning DDP
`num_nodes`; real multi-host TPU can't run in CI, this is the honest
CPU-mesh equivalent.)
"""

import os
import re
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> str:
    """OS-assigned ephemeral port: two concurrent test runs on one host
    must not target the same coordinator address."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


_PORT = _free_port()


def _run_workers():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)  # worker sets cpu via jax.config
    repo_root = str(_WORKER.parent.parent)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), _PORT, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=str(_WORKER.parent.parent), text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    return procs, outs


_SERVING_WORKER = Path(__file__).parent / "multihost_serving_worker.py"


def test_two_process_serving_matches_single_process():
    """Multi-host SERVING analogue of the trainer test: 2 processes x 1
    virtual CPU device run the server's own `--coordinator` build path
    (LM host_shard'ed over a (dp=1, tp=2) process-spanning mesh), host 0
    leading via `server.multihost.wrap_leader` + `engine.inference`, host
    1 replaying through `follower_loop` — and the leader's final audio is
    byte-identical to an unsharded single-process engine on the same
    requests/seeds."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_PLATFORMS", None)
    repo_root = str(_SERVING_WORKER.parent.parent)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(_SERVING_WORKER), port, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=repo_root, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    got = dict(re.findall(r"RESULT pid=0 seed=(\d+) audio=(\w+)", outs[0]))
    # seed 11 runs AFTER an abandoned stream (seed 10): its presence +
    # equality proves the leader's drain kept follower lockstep
    assert set(got) == {"7", "8", "11"}, outs[0][-2000:]
    m_stream = re.search(r"RESULT pid=0 stream seed=9 audio=(\w+)", outs[0])
    assert m_stream, outs[0][-2000:]
    m_served = re.search(r"RESULT pid=1 served=(\d+)", outs[1])
    assert m_served, outs[1][-2000:]
    assert int(m_served.group(1)) == 5, outs[1][-2000:]

    # unsharded single-process reference through the same server build path
    sys.path.insert(0, str(_SERVING_WORKER.parent))
    import multihost_serving_worker as w

    from fish_speech_tpu.server.main import build_engine, parse_args

    engine = build_engine(parse_args(w.WORKER_ARGS))
    for seed in (7, 8, 11):
        assert w.run_request(engine, seed) == got[str(seed)], (
            f"sharded 2-process audio diverged from single-process "
            f"(seed {seed})"
        )
    # streaming comparison must take the same host per-chunk path the
    # multi-host leader took (device_partials off)
    engine.session._multihost_leader = True
    assert w.run_streaming_request(engine, 9) == m_stream.group(1), (
        "sharded 2-process STREAMED audio diverged from single-process"
    )


def test_two_process_train_step_matches_single_process():
    procs, outs = _run_workers()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        m = re.search(
            r"RESULT pid=(\d) loss=([\d.]+) grad_norm=([\d.]+)", out
        )
        assert m, f"no RESULT line in:\n{out[-3000:]}"
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(results) == {0, 1}
    # the psum spans hosts: both report the same global loss/grad-norm
    assert results[0] == pytest.approx(results[1], abs=1e-6)

    # single-process 4-device reference on the identical global batch
    import jax

    sys.path.insert(0, str(_WORKER.parent))
    import multihost_worker as w

    from fish_speech_tpu.parallel.mesh import make_mesh
    from fish_speech_tpu.train.trainer import Trainer

    cfg = w.make_cfg()
    mesh = make_mesh(jax.devices()[:4], dp=4, tp=1)
    trainer = Trainer(cfg, w.make_train_cfg(), mesh=mesh)
    placed = trainer._place_batch(w.make_global_batch(cfg), trainer.bspecs)
    _, _, metrics = trainer.train_step(
        trainer.params, trainer.opt_state, placed
    )
    want_loss = float(metrics["loss"])
    want_grad = float(metrics["grad_norm"])
    np.testing.assert_allclose(results[0][0], want_loss, atol=2e-5)
    np.testing.assert_allclose(results[0][1], want_grad, atol=2e-4)
