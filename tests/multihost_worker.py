"""One simulated host of the 2-process CPU multi-host smoke test.

Launched by `tests/test_multihost.py` as `python multihost_worker.py <port>
<pid>` with XLA_FLAGS forcing 2 virtual CPU devices per process: the two
processes form a 4-device global mesh via `parallel.mesh.init_distributed`
(gloo collectives), each contributes ITS dp rows of a deterministic global
batch through `Trainer._place_batch` (`jax.make_array_from_process_local_
data`), and one real train step runs with the gradient psum spanning both
hosts. The parent compares both hosts' metrics against a single-process
4-device reference run.
"""

import sys
import tempfile

import numpy as np


def make_global_batch(cfg, b=4, t=32, seed=123):
    """Deterministic 4-row global batch every participant agrees on."""
    rng = np.random.default_rng(seed)
    inputs = np.zeros((b, cfg.num_codebooks + 1, t), dtype=np.int32)
    inputs[:, 0] = rng.integers(4, 200, size=(b, t))
    sem = rng.random((b, t)) < 0.6
    for i in range(b):
        codes = rng.integers(0, cfg.codebook_size, size=(cfg.num_codebooks, t))
        span = cfg.semantic_end_id - cfg.semantic_begin_id + 1
        inputs[i, 0, sem[i]] = cfg.semantic_begin_id + codes[0, sem[i]] % span
        inputs[i, 1:, sem[i]] = codes[:, sem[i]].T
    labels = inputs.copy()
    pad_mask = np.zeros((b, t), dtype=bool)
    pad_mask[:, -4:] = True
    labels[:, :, -4:] = -100
    return {"inputs": inputs, "labels": labels, "pad_mask": pad_mask}


def make_cfg():
    from fish_speech_tpu.config import dual_ar_tiny

    return dual_ar_tiny(
        semantic_begin_id=300, semantic_end_id=331, im_end_id=3,
        max_seq_len=64,
    )


def make_train_cfg():
    from fish_speech_tpu.train.trainer import TrainConfig

    return TrainConfig(
        output_dir=tempfile.mkdtemp(), project="mh", max_steps=1,
        batch_size=2, max_length=32, dp=4, tp=1, precision="float32",
        warmup_steps=1, lr=1e-3,
    )


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    import jax

    jax.config.update("jax_platforms", "cpu")

    from fish_speech_tpu.parallel.mesh import init_distributed
    from fish_speech_tpu.train.trainer import Trainer

    assert init_distributed(f"localhost:{port}", num_hosts=2, host_id=pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 4 and jax.local_device_count() == 2

    cfg = make_cfg()
    trainer = Trainer(cfg, make_train_cfg())
    global_batch = make_global_batch(cfg)
    local = {k: v[pid * 2 : (pid + 1) * 2] for k, v in global_batch.items()}
    placed = trainer._place_batch(local, trainer.bspecs)
    _, _, metrics = trainer.train_step(
        trainer.params, trainer.opt_state, placed
    )
    print(
        f"RESULT pid={pid} loss={float(metrics['loss']):.6f} "
        f"grad_norm={float(metrics['grad_norm']):.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
